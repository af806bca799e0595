package graft

import org.apache.spark.sql.functions.{col, lit, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Skew}

/** Batch specs for the skew-salting utility (q22) and the multimodal
  * resize stub (m03). */
class SkewMultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  test("q22 salted join equals plain join under planted 90% key skew") {
    import spark.implicits._
    // 900 of 1000 fact rows hit key 7 — the hot-key shape salting exists for
    val fact = (0L until 1000L)
      .map(i => (i, if (i < 900) 7L else i % 5)).toDF("id", "k")
    val dim = (0L until 10L).map(k => (k, s"dim_$k")).toDF("dk", "payload")
    val saltedRows = Skew
      .saltedJoin(fact, dim, "k", "dk", col("id"), salts = 8)
      .select("id", "k", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // length FIRST: a salted join that duplicates matches (e.g. a dropped
    // __salt equality) must fail here, not be collapsed away by a Set
    assert(saltedRows.length === 1000)
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("id", "k", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(saltedRows.toSet === plain && plain.size === 1000)
  }

  test("AQE splits a planted skewed join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4096",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50% of 100k rows land on key 7 → that shuffle partition is far
      // past factor×median AND the threshold, so AQE must rewrite the
      // sort-merge join with a skew-split shuffle read. The pad must be
      // INCOMPRESSIBLE (per-row md5) — skew detection reads compressed
      // map-output sizes, and a constant pad deflates below threshold.
      import org.apache.spark.sql.functions.md5
      val left = spark.range(100000)
        .select(when($"id" % 2 === 0, 7L).otherwise($"id").as("k"),
          md5($"id".cast("string")).as("pad"))
      val right = spark.range(20000)
        .select($"id".as("rk"), md5(($"id" * 31).cast("string")).as("rpad"))
      val joined = left.join(right, $"k" === $"rk")
      // execute THIS DataFrame's own QueryExecution (a write action plans
      // a separate one, leaving this plan isFinalPlan=false)
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("m07 aHash: identical payloads collide, small edits stay near," +
    " different content lands far") {
    val base = Array.tabulate[Byte](512)(i => ((i * 37 + 11) % 251).toByte)
    val near = base.clone()
    near(500) = (near(500) ^ 0x7f).toByte // one-byte edit near the tail
    val far = Array.tabulate[Byte](512)(i => ((i * i + 97) % 241).toByte)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(Multimodal.aHash64(base) === Multimodal.aHash64(base.clone()))
    assert(ham(Multimodal.aHash64(base), Multimodal.aHash64(near)) <= 3,
      "a local edit must flip at most a few grid bits")
    assert(ham(Multimodal.aHash64(base), Multimodal.aHash64(far)) > 10,
      "unrelated content must land far apart")
  }

  test("m07 band join surfaces planted near-dup payloads, skips unrelated") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-m07").toString
    val passage = (1 to 200).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, passage, "en", "s", passage.length.toLong),
      // near-dup: the last word changes — a local byte-level edit
      (2L, passage.dropRight(6) + "tokXXX", "en", "s", passage.length.toLong),
      (3L, (1 to 200).map(i => s"zz${i * 7}q").mkString(" "), "en", "s", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Multimodal.m07PhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"planted near-dup missed: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated payload falsely paired: ${pairs.toSeq}")
  }

  test("m07 oracle byte contract: corpus text is non-empty ASCII") {
    // The m07 DuckDB oracle derives payload bytes as ascii(text[k]) —
    // exact only for non-empty ASCII text (a non-ASCII char diverges;
    // an empty text vanishes from the oracle while the engine hashes it
    // to 0). Pin the contract the oracle relies on instead of leaving
    // it implicit (round-9 advice).
    val bad = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("text"))
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) === 0 ||
        org.apache.spark.sql.functions.col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(bad === 0L,
      "documents.text must be non-empty ASCII for m07's byte-level oracle")
  }

  test("m10 interleave: image slot before every chunk pair, costs and " +
      "positions line up") {
    import org.apache.spark.sql.functions.{length, md5, substring}
    val sfDir = SparkSessionFixture.sfDir
    val rows = Multimodal.m10Interleave(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // position algebra: seq_pos % 3 == 0 ⇔ image; image cost fixed at
    // the 576-patch convention; text cost = ceil(chars/4) ∈ [1, 32]
    rows.foreach { r =>
      val (pos, kind, cost) = (r.getLong(1), r.getString(2), r.getLong(3))
      if (pos % 3 == 0) assert(kind == "image" && cost == 576L)
      else assert(kind == "text" && cost >= 1L && cost <= 32L)
    }
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val nTxt = rs.count(_.getString(2) == "text")
      val nImg = rs.count(_.getString(2) == "image")
      assert(nImg === (nTxt + 1) / 2,
        s"doc $doc: one image per chunk pair, got $nImg for $nTxt chunks")
      assert(rs.map(_.getLong(1)).distinct.length === rs.length,
        s"doc $doc: duplicate seq positions")
    }
    // content keys are the c03-style substring md5s — pin one doc
    val doc0 = byDoc.keys.min
    val firstKey = byDoc(doc0).filter(r => r.getLong(1) == 1L)
      .map(_.getString(4)).head
    val expect = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") === doc0)
      .select(md5(substring(col("text"), 1, 128))).collect().head.getString(0)
    assert(firstKey === expect, "first text chunk key must be md5(first 128 chars)")
  }

  test("m03 resize stub: ceil stride spans the payload, dims scale") {
    val r = Multimodal.MediaRow(0L, Array.tabulate[Byte](127)(_.toByte),
      width = 320, height = 240, format = "png")
    val out = Multimodal.resizeStub(r)
    // ceil(127/64) = 2 → samples 0,2,4,...,126: both halves represented
    assert(out.thumb_bytes === 64 && out.thumb.length === 64)
    assert(out.thumb(63) === 126.toByte, "stride must reach the tail")
    assert(out.thumb_w === 64 && out.thumb_h === 48) // 64 * 240/320
    // short payload: thumb = whole payload
    val small = Multimodal.resizeStub(r.copy(payload = Array[Byte](1, 2, 3)))
    assert(small.thumb.toSeq === Seq[Byte](1, 2, 3))
    // determinism
    assert(Multimodal.resizeStub(r).thumb.toSeq === out.thumb.toSeq)
  }
}
