package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, md5}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DupDensity, Lsh, Multimodal, TextAnalysis}

/** The dup-density gate's two contracts:
  *
  *  1. The PROBE picks the right path: collapse on a high-dup corpus,
  *     direct on a ~unique one (so the collapse overhead never taxes a
  *     low-dup workload, and the collapse win is never missed at scale).
  *  2. The paths are OUTPUT-IDENTICAL — on dup-heavy corpora, on unique
  *     ones, and on the degenerate all-zero-embedding case the round-5
  *     advisory flagged — so the gate is a pure cost chooser and can
  *     never change results, whichever way the probe decides.
  *
  * Plus the unit envelope of the shared Lsh band-geometry helper.
  */
class DupGateSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  private val sfDir = SparkSessionFixture.sfDir

  // ---- fixtures ----

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-gate-docs").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val data = rows.map { case (id, text) =>
      Row(id, text, "en", "srcT",
        if (text == null) 0L else text.length.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embsDir(rows: Seq[(Long, Array[Float])]): String = {
    val dir = Files.createTempDirectory("graft-gate-embs").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val data = rows.map { case (id, v) => Row(id, v.toSeq, (id % 3).toInt) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private val words =
    (1 to 80).map(i => f"tok$i%02d")
  private val textA = words.slice(0, 40).mkString(" ")
  private val textB = words.slice(20, 60).mkString(" ")
  private val textC = words.slice(40, 80).mkString(" ")
  private val textAnear = words.slice(0, 40).updated(7, "MUT").mkString(" ")

  /** ~60-doc corpus, >60% verbatim copies + near-dups + shared passages
    * (so d10 has real cross-doc duplicated spans). */
  private lazy val dupHeavyDocs: String = docsDir(
    (0L until 20L).map(i => i -> textA) ++
      (20L until 30L).map(i => i -> textB) ++
      Seq(30L -> textAnear, 31L -> textC, 32L -> (textC + " tail77"),
        33L -> "short doc") ++
      (34L until 40L).map(i => i -> words.slice(10, 50).mkString(" ")))

  /** ~unique corpus: every text distinct. */
  private lazy val uniqueDocs: String = docsDir(
    (0L until 40L).map(i =>
      i -> words.map(w => s"$w-$i").slice(0, 30).mkString(" ")))

  /** dup-heavy corpus PLUS two null-text rows (their own dup class):
    * the round-9 advice case — the collapsed path's md5(text) group key
    * is null for null text, and without the key coalesce the expansion
    * join silently dropped those rows while the direct path kept them. */
  private lazy val nullTextDocs: String = docsDir(
    (0L until 20L).map(i => i -> textA) ++
      Seq(20L -> textB, 21L -> (null: String), 22L -> (null: String)))

  /** Deterministic pseudo-vectors, 16-dim; base directions far apart,
    * dups verbatim, one near-dup pair, one all-zero group (degenerate:
    * self-cosine NaN). */
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(16)(r.nextFloat() * 2f - 1f)
  }
  private lazy val dupHeavyEmbs: String = {
    val a = vec(1); val b = vec(2); val c = vec(3)
    val aNear = a.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.05f else x } // cos(a, aNear) ≈ 1 > 0.45
    val zero = Array.fill(16)(0f)
    embsDir(
      (0L until 12L).map(i => i -> a) ++
        (12L until 20L).map(i => i -> b) ++
        Seq(20L -> c, 21L -> aNear, 22L -> zero, 23L -> zero) ++
        (24L until 30L).map(i => i -> vec(100 + i.toInt)))
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  // ---- Lsh helper envelope ----

  test("Lsh.scaled stays inside the bands×bits ≤ 64 envelope at any n") {
    val ns = Seq(0L, 1L, 63L, 64L, 100L, 4096L, 65536L, 1000000L,
      1L << 30, 1L << 40, 1L << 50)
    var prevBits = 0
    ns.foreach { n =>
      val g = Lsh.scaled(n)
      assert(g.bands * g.bits <= 64, s"n=$n: ${g.bands}×${g.bits}")
      assert(g.bits >= 4 && g.bits <= 16, s"n=$n bits=${g.bits}")
      assert(g.bands >= 2 && g.bands <= 8, s"n=$n bands=${g.bands}")
      assert(g.bits >= prevBits, s"bits must grow with n (n=$n)")
      prevBits = g.bits
    }
    // occupancy target: at n items and ~64/bucket, bucket space covers n
    val g = Lsh.scaled(100000L)
    assert((1L << g.bits) >= 100000L / 64 / 2, "buckets must scale with n")
  }

  test("Lsh.pigeonhole splits 64 bits into hamming+1 exact bands") {
    assert(Lsh.pigeonhole(64, 3) === Lsh.BandGeometry(4, 16))
    assert(Lsh.pigeonhole(64, 1) === Lsh.BandGeometry(2, 32))
    assertThrows[IllegalArgumentException](Lsh.pigeonhole(64, 4))
  }

  test("minhash (4,4) banding threshold sits just above the 0.6 verify τ") {
    val s = Lsh.minhashThreshold(Lsh.MinhashBands, Lsh.MinhashRows)
    assert(math.abs(s - math.pow(0.25, 0.25)) < 1e-12)
    assert(s > 0.6 && s < 0.8)
  }

  // ---- probe ----

  test("density probe: collapse on high-dup, direct on unique corpora") {
    val dup = DupDensity.probe(
      spark.read.parquet(s"$dupHeavyDocs/documents.parquet"), md5(col("text")))
    assert(dup.collapseWorthIt, s"high-dup corpus misread: $dup")
    val uni = DupDensity.probe(
      spark.read.parquet(s"$uniqueDocs/documents.parquet"), md5(col("text")))
    assert(!uni.collapseWorthIt, s"unique corpus misread: $uni")
    // the gate SFs are ~unique — sf0.001 must take the direct path
    val sf = DupDensity.probe(
      spark.read.parquet(s"$sfDir/documents.parquet"), md5(col("text")))
    assert(!sf.collapseWorthIt, s"sf0.001 misread as collapsible: $sf")
  }

  // ---- path equality, text operators ----

  test("d02 direct == collapsed on dup-heavy and unique corpora") {
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      assert(rowsOf(Dedup.d02Direct(spark, dir)) ===
        rowsOf(Dedup.d02Collapsed(spark, dir)), s"dir=$dir")
    }
  }

  test("d03 direct == collapsed on dup-heavy and unique corpora") {
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      assert(rowsOf(Dedup.d03Direct(spark, dir)) ===
        rowsOf(Dedup.d03Collapsed(spark, dir)), s"dir=$dir")
    }
  }

  test("d10 direct == collapsed on dup-heavy and unique corpora") {
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      assert(rowsOf(Dedup.d10Direct(spark, dir)) ===
        rowsOf(Dedup.d10Collapsed(spark, dir)), s"dir=$dir")
    }
  }

  test("t04 direct == collapsed on dup-heavy and unique corpora") {
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      assert(rowsOf(TextAnalysis.t04Direct(spark, dir)) ===
        rowsOf(TextAnalysis.t04Collapsed(spark, dir)), s"dir=$dir")
    }
  }

  test("m07 direct == collapsed on dup-heavy and unique corpora") {
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      val hashed = Multimodal.m07Hashed(spark, dir)
      assert(rowsOf(Multimodal.m07Direct(hashed)) ===
        rowsOf(Multimodal.m07Collapsed(hashed)), s"dir=$dir")
    }
  }

  test("d12 band rows: direct == collapsed row-for-row") {
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      assert(rowsOf(Dedup.bandRowsDirect(docs)) ===
        rowsOf(Dedup.bandRowsCollapsed(docs)), s"dir=$dir")
    }
  }

  test("t-family per-text collapse: direct == collapsed per op") {
    import org.apache.spark.sql.DataFrame
    import graft.operators.{TextAnalysis => TA}
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      val cases: Seq[(String, Boolean => DataFrame)] = Seq(
        ("t01", c => TA.perTextPath(spark, dir, c)(TA.t01Body)),
        ("t02", c => TA.perTextPath(spark, dir, c)(TA.t02Body)),
        ("t03", c => TA.perTextPath(spark, dir, c)(TA.t03Body)),
        ("t06", c => TA.perTextPath(spark, dir, c)(TA.t06Body)),
        ("t07", c => TA.perTextPath(spark, dir, c)(TA.t07Body)),
        ("t08", c => TA.perTextPath(spark, dir, c)(TA.t08Body)),
        ("t13", c => TA.perTextPath(spark, dir, c)(TA.t13Body)),
        ("t19", c => TA.perTextPath(spark, dir, c, TA.t19Flags)(TA.t19Body)),
        ("t16", c => if (c) TA.t16Collapsed(spark, dir)
                     else TA.t16Direct(spark, dir)),
        ("t20", c => TA.t20Path(spark, dir, c)))
      cases.foreach { case (n, f) =>
        assert(rowsOf(f(false)) === rowsOf(f(true)), s"op=$n dir=$dir")
      }
    }
  }

  test("t-family per-text collapse keeps null-text rows path-equal") {
    import org.apache.spark.sql.DataFrame
    import graft.operators.{TextAnalysis => TA}
    val dir = nullTextDocs
    val cases: Seq[(String, Boolean => DataFrame)] = Seq(
      ("t01", c => TA.perTextPath(spark, dir, c)(TA.t01Body)),
      ("t02", c => TA.perTextPath(spark, dir, c)(TA.t02Body)),
      ("t03", c => TA.perTextPath(spark, dir, c)(TA.t03Body)),
      ("t06", c => TA.perTextPath(spark, dir, c)(TA.t06Body)),
      ("t07", c => TA.perTextPath(spark, dir, c)(TA.t07Body)),
      ("t08", c => TA.perTextPath(spark, dir, c)(TA.t08Body)),
      ("t13", c => TA.perTextPath(spark, dir, c)(TA.t13Body)),
      ("t19", c => TA.perTextPath(spark, dir, c, TA.t19Flags)(TA.t19Body)))
    cases.foreach { case (n, f) =>
      assert(rowsOf(f(false)) === rowsOf(f(true)), s"op=$n")
    }
  }

  test("t08 decomposed scrub equals the full augmented-string reference") {
    import org.apache.spark.sql.functions._
    import graft.operators.{TextAnalysis => TA}
    // PII-laced texts exercising nonzero text-part counts AND the
    // boundary cases the decomposition depends on: text ending in
    // digits (must not fuse with the planted suffix), a partial email
    // at end-of-text (must not complete across the boundary), and a
    // verbatim dup under a different doc_id (the collapse class).
    val dir = docsDir(Seq(
      0L -> "mail a@b.co and ping 1.2.3.4 now",
      1L -> "call +1-555-9999 or half +1-555-123 only",
      2L -> "no pii at all tok tok",
      3L -> "edge ends with digits 12",
      4L -> "partial email at end a@b",
      5L -> "mail a@b.co and ping 1.2.3.4 now"))
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or 10."),
      pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
      pmod(col("doc_id") * 7, lit(256)).cast("string"),
      lit(".4 tel +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(
      col("aug"), emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>")
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("aug"), lit(ipRe)).cast("long").as("n_ips"),
        regexp_count(col("aug"), lit(phoneRe)).cast("long").as("n_phones"),
        md5(scrubbed).as("scrub_md5"))
    Seq(false, true).foreach { c =>
      assert(rowsOf(TA.perTextPath(spark, dir, c)(TA.t08Body)) ===
        rowsOf(want), s"collapsed=$c")
    }
  }

  test("t10 direct == collapsed on dup-heavy and unique corpora") {
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      assert(rowsOf(TextAnalysis.t10Direct(spark, dir)) ===
        rowsOf(TextAnalysis.t10Collapsed(spark, dir)), s"dir=$dir")
    }
  }

  test("curation contamination strip: direct == collapsed paths") {
    import graft.operators.Pipelines
    Seq(dupHeavyDocs, uniqueDocs).foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val d = Pipelines.curateBatch(docs,
        Pipelines.evalGramsOf(docs, collapsed = false), collapsed = false)
      val c = Pipelines.curateBatch(docs,
        Pipelines.evalGramsOf(docs, collapsed = true), collapsed = true)
      assert(rowsOf(d) === rowsOf(c), s"dir=$dir")
    }
  }

  // ---- path equality, embedding operators (incl. the degenerate
  //      all-zero vector the round-5 advisory flagged) ----

  test("d06 direct == collapsed, zero-vector dups handled identically") {
    val g = Lsh.scaled(18) // ≈ the distinct count of the fixture
    val direct = rowsOf(Dedup.d06Direct(spark, dupHeavyEmbs, g))
    val collapsed = rowsOf(Dedup.d06Collapsed(spark, dupHeavyEmbs, g))
    assert(direct === collapsed)
    // the verbatim-copy pairs must actually be present (the fixture has
    // 12 copies of a → 66 within-pairs at minimum)
    assert(direct.size >= 66, s"expected the dup pairs, got ${direct.size}")
    // and the zero-vector pair (22,23) behaves the same on both paths —
    // membership itself is pinned by equality above; just make sure the
    // fixture exercised it
    val zeroPair = direct.count(_.startsWith("[22,23,"))
    val collapsedZeroPair = collapsed.count(_.startsWith("[22,23,"))
    assert(zeroPair === collapsedZeroPair)
  }

  test("d09 direct == collapsed keep/drop decisions, zero vectors too") {
    val k = 8
    val direct = rowsOf(Dedup.d09Direct(spark, dupHeavyEmbs, k))
    val collapsed = rowsOf(Dedup.d09Collapsed(spark, dupHeavyEmbs, k))
    assert(direct === collapsed)
  }

  test("d06/d09 public entries run the gate end-to-end on sf data") {
    // smoke the dispatching wrappers themselves (direct path at sf0.001)
    assert(Dedup.d06DedupEmbeddingLsh(spark, sfDir).count() >= 0)
    assert(Dedup.d09SemDedup(spark, sfDir).count() > 0)
  }

  test("COLLAPSED plans pass the scale-killer sweep too") {
    // The suite-wide ExplainAudit sweep builds plans at the gate SF,
    // where the density probe always picks the DIRECT path — so the
    // collapsed plans (the ones that actually run on a dup-heavy 100 TB
    // corpus) would otherwise carry no plan audit at all. Build every
    // collapsed variant on the dup-heavy fixtures and apply the same
    // two contracts: no CartesianProductExec, no unbounded
    // unpartitioned WindowExec.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import graft.operators.{Pipelines, TextAnalysis => TA}
    def bounded(p: SparkPlan): Boolean = {
      val s = p.toString
      s.contains("TakeOrderedAndProject") || s.contains("CollectLimit") ||
        s.contains("GlobalLimit") || s.contains("LocalLimit")
    }
    val dir = dupHeavyDocs
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
    val g = Lsh.scaled(18)
    val plans: Seq[(String, DataFrame)] = Seq(
      "d02" -> Dedup.d02Collapsed(spark, dir),
      "d03" -> Dedup.d03Collapsed(spark, dir),
      "d06" -> Dedup.d06Collapsed(spark, dupHeavyEmbs, g),
      "d09" -> Dedup.d09Collapsed(spark, dupHeavyEmbs, 8),
      "d10" -> Dedup.d10Collapsed(spark, dir),
      "d12bands" -> Dedup.bandRowsCollapsed(docsDf),
      "t04" -> TA.t04Collapsed(spark, dir),
      "t10" -> TA.t10Collapsed(spark, dir),
      "t16" -> TA.t16Collapsed(spark, dir),
      "t20" -> TA.t20Path(spark, dir, collapsed = true),
      "t01" -> TA.perTextPath(spark, dir, collapsed = true)(TA.t01Body),
      "t07" -> TA.perTextPath(spark, dir, collapsed = true)(TA.t07Body),
      "t13" -> TA.perTextPath(spark, dir, collapsed = true)(TA.t13Body),
      "t19" -> TA.perTextPath(spark, dir, collapsed = true,
        TA.t19Flags)(TA.t19Body),
      "p11curate" -> Pipelines.curateBatch(docsDf,
        Pipelines.evalGramsOf(docsDf, collapsed = true), collapsed = true),
      "m07" -> Multimodal.m07Collapsed(Multimodal.m07Hashed(spark, dir)))
    val offenders = plans.flatMap { case (name, df) =>
      val plan = df.queryExecution.sparkPlan
      (plan +: plan.subqueriesAll).flatMap(_.collect {
        case w: WindowExec
            if w.partitionSpec.isEmpty && !bounded(w.child) =>
          s"$name: unbounded unpartitioned WindowExec over ${w.child.nodeName}"
        case c: CartesianProductExec =>
          s"$name: CartesianProductExec (${c.left.nodeName} × ${c.right.nodeName})"
      })
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
