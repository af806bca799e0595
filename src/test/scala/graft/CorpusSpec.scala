package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Behavior specs for the corpus-assembly tier (SURVEY.md §2 c01–c05):
  * the packing invariants a training run actually depends on — nothing
  * lost, nothing split that must not split, budgets respected with the
  * greedy-prefix semantics — checked on planted fixtures where the
  * right answer is hand-computable, plus the real sf table for
  * population-level invariants.
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  private val sfDir = SparkSessionFixture.sfDir

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-corpus").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val data = rows.map { case (id, text, lang, src) =>
      Row(id, text, lang, src, text.length.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("c01 concat packing: placement is the exact running-tape arithmetic") {
    // costs (words+EOD): 101, 200, 61 → tape: [0,100], [101,300], [301,361]
    // with T=256: doc0 pack0 off0; doc1 pack0 off101 STRADDLES into pack1;
    // doc2 pack1 off45 (301-256), no straddle (ends at 361 < 512).
    val dir = docsDir(Seq(
      (0L, words(100), "en", "a"), (1L, words(199), "en", "a"),
      (2L, words(60), "en", "a")))
    val got = Corpus.c01PackConcat(spark, dir)
      .orderBy("doc_id")
      .select("doc_id", "pack_id", "pack_offset", "n_tokens", "straddles")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got === Seq(
      (0L, 0L, 0L, 100L, false),
      (1L, 0L, 101L, 199L, true),
      (2L, 1L, 45L, 60L, false)))
  }

  test("c01 on the sf table: offsets in range, straddle flag consistent") {
    val rows = Corpus.c01PackConcat(spark, sfDir)
      .select("pack_offset", "n_tokens", "straddles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, cost) = (r.getLong(0), r.getLong(1) + 1) // +EOD
      assert(off >= 0 && off < 256)
      assert(r.getBoolean(2) === (off + cost - 1 >= 256),
        s"straddle flag disagrees with tape arithmetic at off=$off cost=$cost")
    }
  }

  test("c02 greedy packing: first-fit, no splits, oversized isolated") {
    // costs: 200, 100, 50, 300, 6 → greedy with T=256:
    // doc0 opens p0 (rem 56); doc1 (100) doesn't fit → p1 (rem 156);
    // doc2 (50) fits p1 (rem 106); doc3 (300, oversized) → p2 (rem -44);
    // doc4 (6) doesn't fit (rem<cost) → p3.
    val dir = docsDir(Seq(
      (0L, words(199), "en", "a"), (1L, words(99), "en", "a"),
      (2L, words(49), "en", "a"), (3L, words(299), "en", "a"),
      (4L, words(5), "en", "a")))
    val got = Corpus.c02PackGreedy(spark, dir)
      .orderBy("doc_id").select("doc_id", "pack_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 0L), (1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("c02 on the sf table: packs fit unless single-doc, seqs contiguous") {
    val a = Corpus.c02PackGreedy(spark, sfDir)
      .withColumn("cost", col("n_tokens") + 1)
    val packs = a.groupBy("bucket", "pack_seq")
      .agg(sum("cost").as("fill"), count(lit(1)).as("n"))
      .collect()
    packs.foreach { r =>
      assert(r.getLong(2) <= 256 || r.getLong(3) === 1L,
        s"multi-doc pack over budget: $r")
    }
    // pack_seq per bucket is 0..max with no gaps
    a.groupBy("bucket")
      .agg(min("pack_seq").as("mn"), max("pack_seq").as("mx"),
        countDistinct("pack_seq").as("n"))
      .collect().foreach { r =>
        assert(r.getLong(1) === 0L && r.getLong(2) === r.getLong(3) - 1)
      }
  }

  test("c03 chunking: stride/overlap geometry and full tail coverage") {
    val dir = docsDir(Seq(
      (0L, "x" * 119, "en", "a"),   // < W: one short chunk
      (1L, "y" * 120, "en", "a"),   // == W: exactly one chunk
      (2L, "z" * 200, "en", "a"),   // starts 0, 80: tail len 120
      (3L, "q" * 281, "en", "a")))  // starts 0, 80, 160, 240: tail 41
    val got = Corpus.c03ChunkOverlap(spark, dir)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      (0L, 0L, 0L, 119L),
      (1L, 0L, 0L, 120L),
      (2L, 0L, 0L, 120L), (2L, 1L, 80L, 120L),
      (3L, 0L, 0L, 120L), (3L, 1L, 80L, 120L), (3L, 2L, 160L, 120L),
      (3L, 3L, 240L, 41L)))
  }

  test("c03 on the sf table: every char of every doc is covered") {
    val perDoc = Corpus.c03ChunkOverlap(spark, sfDir)
      .groupBy("doc_id")
      .agg(max(col("chunk_start") + col("chunk_len")).as("covered"),
        sum(when(col("chunk_len") =!= 120, 1).otherwise(0)).as("short"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .where(col("len") > 0)
    val bad = perDoc.join(docs, "doc_id")
      .where(col("covered") =!= col("len") || col("short") > 1)
      .count()
    assert(bad === 0L, "chunk tails must land exactly on the doc end, " +
      "with at most one short (tail) chunk per doc")
  }

  test("c04 budget mix: kept set is the exact greedy prefix per domain") {
    val kept = Corpus.c04TokenBudgetMix(spark, sfDir)
    // recompute the naive form with a per-domain window and compare sets
    val toks = size(filter(split(lower(col("text")), " "),
      w => length(w) > 0))
    val uniq = size(array_distinct(filter(split(lower(col("text")), " "),
      w => length(w) > 0)))
    val sc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("lang"), col("doc_id"),
        toks.as("toks"), uniq.as("uniq"))
      .where(col("toks") > 0)
      .withColumn("score", expr("(cast(uniq as bigint) * 1000000) div toks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "lang").orderBy(col("score").desc, col("doc_id"))
    val naive = sc.withColumn("cum", sum("toks").over(w))
      .join(sc.groupBy("source", "lang")
        .agg(expr("(sum(toks) * 2) div 5").as("budget")),
        Seq("source", "lang"))
      .where(col("cum") <= col("budget"))
      .select("source", "lang", "doc_id", "cum")
    val mismatches = kept.select("source", "lang", "doc_id", "cum_tokens")
      .except(naive.withColumnRenamed("cum", "cum_tokens"))
      .union(naive.withColumnRenamed("cum", "cum_tokens")
        .except(kept.select("source", "lang", "doc_id", "cum_tokens")))
      .count()
    assert(mismatches === 0L,
      "banded two-pass selection must equal the naive greedy prefix")
  }

  test("c04 plan: the per-doc window partitions by (domain, band), " +
    "never by domain alone") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = Corpus.c04TokenBudgetMix(spark, sfDir)
      .queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w.partitionSpec.size }
    assert(windows.nonEmpty)
    // fact-side window: 3 keys (source, lang, band). The band-aggregate
    // window (2 keys) runs over ~thousands of rows, never the corpus.
    assert(windows.contains(3),
      s"per-doc window lost its band key: partition sizes $windows")
  }

  test("st23 streaming packer: multi-batch run lands exactly on the " +
    "batch packer's assignments") {
    val stream = streaming.EventStreams.st23StreamPack(spark, sfDir)
      .select("doc_id", "bucket", "pack_seq", "n_tokens")
    val batch = Corpus.c02PackGreedy(spark, sfDir)
      .select("doc_id", "bucket", "pack_seq", "n_tokens")
    assert(batch.count() > 0L)
    assert(stream.except(batch).union(batch.except(stream)).count() === 0L,
      "incremental packing diverged from the batch fold")
  }

  test("st23 state carries an OPEN pack across micro-batches") {
    // six 101-cost docs over ≥2 doc_id-range triggers (staging always
    // cuts ≥2 chunks): greedy pairs them p0{0,1} p1{2,3} p2{4,5}, so the
    // first doc of batch 2 must land in a pack OPENED IN BATCH 1 — a
    // lost (seq, rem) state shows up as a reset pack_seq here.
    val dir = docsDir((0L to 5L).map(i => (i, words(100), "en", "a")))
    val got = streaming.EventStreams.st23StreamPack(spark, dir)
      .orderBy("doc_id").select("doc_id", "pack_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L)))
  }

  test("st28 streaming length-batcher: multi-batch run lands exactly " +
    "on the batch assignments") {
    val cols = Seq("doc_id", "pad_len", "n_tokens", "batch_seq", "waste")
    val stream = streaming.EventStreams
      .st28StreamLengthBatches(spark, sfDir).select(cols.map(col): _*)
    val batch = Corpus.c11LengthBatches(spark, sfDir)
      .select(cols.map(col): _*)
    assert(batch.count() > 0L)
    assert(stream.except(batch).union(batch.except(stream)).count() === 0L,
      "incremental length batching diverged from the batch rank")
  }

  test("st28 state carries the octave fill count across micro-batches") {
    // forty 100-cost docs → octave pad_len 128, capacity 4096/128 = 32:
    // batch_seq must be doc_id div 32 even though the doc_id-range
    // staging cuts ≥2 chunks — a lost per-octave count shows up as a
    // batch_seq reset at the chunk boundary.
    val dir = docsDir((0L to 39L).map(i => (i, words(100), "en", "a")))
    val got = streaming.EventStreams.st28StreamLengthBatches(spark, dir)
      .orderBy("doc_id").select("doc_id", "pad_len", "batch_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === (0L to 39L).map(i => (i, 128L, i / 32L)))
  }

  test("c08 epoch shuffle: reproducible permutation, balanced shards, " +
    "keys stable under corpus growth") {
    val a = Corpus.c08EpochShuffle(spark, sfDir)
    // per-shard positions are a contiguous 1..count permutation
    val shards = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
      .collect()
    assert(shards.nonEmpty)
    shards.foreach { r =>
      assert(r.getLong(2) === 1L && r.getLong(3) === r.getLong(1),
        s"shard positions must be contiguous 1..n: $r")
    }
    // nothing lost, nothing duplicated
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(a.count() === n && a.select("doc_id").distinct().count() === n)
    // actually shuffled: shard-order disagrees with doc_id order
    val firstByKey = a.orderBy("shard", "pos").select("doc_id")
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(firstByKey !== firstByKey.sorted,
      "epoch order must not degenerate to doc_id order")
    // identity hash: a doc's key is corpus-independent (epoch-stable)
    val big = Corpus.c08EpochShuffle(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("skey").as("skey_big"))
    assert(a.select("doc_id", "skey").join(big, "doc_id")
      .where(col("skey") =!= col("skey_big")).count() === 0L)
  }

  test("c09 curriculum: three-term decomposition equals the naive " +
    "global window, phases are even deciles") {
    val got = Corpus.c09Curriculum(spark, sfDir)
    val toks = size(filter(split(lower(col("text")), " "),
      w => length(w) > 0)).cast("bigint")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score"), col("doc_id"))
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), toks.as("score"))
      .withColumn("global_pos", row_number().over(w).cast("bigint"))
    val n = naive.count()
    val diff = got.select("doc_id", "score", "global_pos")
      .except(naive.select("doc_id", "score", "global_pos")).count()
    assert(diff === 0L,
      "distributed rank must equal the single-window global rank")
    // phases 0..9 cover n/10 each (±1 on the remainder boundary)
    val phases = got.groupBy("phase").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(phases.keySet === (0L to 9L).toSet)
    phases.values.foreach(c =>
      assert(math.abs(c - n / 10) <= 1, s"uneven phase: $phases"))
  }

  test("c09 planted fixture: empty and short docs order easy-first") {
    val dir = docsDir(Seq(
      (0L, words(5), "en", "a"), (1L, words(2), "en", "a"),
      (2L, words(5), "en", "a"), (3L, "", "en", "a"),
      (4L, words(2), "en", "a")))
    val got = Corpus.c09Curriculum(spark, dir)
      .orderBy("global_pos").select("doc_id", "global_pos", "phase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // order: id3 (0 toks), id1, id4 (2 toks, id tiebreak), id0, id2
    assert(got === Seq((3L, 1L, 0L), (1L, 2L, 2L), (4L, 3L, 4L),
      (0L, 4L, 6L), (2L, 5L, 8L)))
  }

  test("c10 mix schedule: closed-form positions equal the hand-computed " +
    "weighted interleave, and form a permutation") {
    // src0: 3000 docs -> B=3, w=1 (ticks 0,6,12); src1: 2500 -> B=3,
    // w=2 (ticks 0,3,6); src2: 1100 -> B=2, w=3 (ticks 0,2). Order by
    // (tick, source): src0k0, src1k0, src2k0, src2k1, src1k1, src0k1,
    // src1k2, src0k2.
    val rows =
      (0L until 3000L).map(i => (i, "w", "en", "src0")) ++
      (3000L until 5500L).map(i => (i, "w", "en", "src1")) ++
      (5500L until 6600L).map(i => (i, "w", "en", "src2"))
    val dir = docsDir(rows)
    val got = Corpus.c10MixSchedule(spark, dir)
    val sched = got.select("source", "blk", "blk_pos").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(sched === Map(
      ("src0", 0L) -> 0L, ("src1", 0L) -> 1L, ("src2", 0L) -> 2L,
      ("src2", 1L) -> 3L, ("src1", 1L) -> 4L, ("src0", 1L) -> 5L,
      ("src1", 2L) -> 6L, ("src0", 2L) -> 7L))
    // positions are a permutation of 0..n_blocks-1; every doc scheduled
    assert(sched.values.toSeq.sorted === (0L until 8L))
    assert(got.count() === 6600L)
  }

  test("c06 split: stable under corpus growth, text-independent, ~98/1/1") {
    val dirSmall = docsDir((0L to 99L).map(i => (i, words(10), "en", "a")))
    val small = Corpus.c06SplitAssign(spark, dirSmall)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // same ids + 100 more, and DIFFERENT texts for the original ids:
    // every original assignment must be unchanged (growth- and
    // content-stability are the whole point of hashing identity)
    val dirBig = docsDir((0L to 199L).map(i => (i, words(17), "en", "a")))
    val big = Corpus.c06SplitAssign(spark, dirBig)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, sp) => assert(big(id) === sp,
      s"doc $id moved from $sp to ${big(id)} when the corpus grew") }
    // on the sf table the 98/1/1 target holds loosely (hash variance)
    val counts = Corpus.c06SplitAssign(spark, sfDir)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.95)
    assert(counts.getOrElse("valid", 0L) + counts.getOrElse("test", 0L) > 0)
  }

  test("c07 split leak: planted duplicate text across the boundary is " +
    "caught; clean corpus is silent") {
    // 400 docs all sharing ONE text: every holdout doc leaks against
    // train doc min-id; distinct texts elsewhere stay silent
    val dup = (0L to 399L).map(i => (i, "the same text", "en", "a"))
    val clean = (400L to 449L).map(i => (i, s"unique text $i", "en", "a"))
    val dir = docsDir(dup ++ clean)
    val assigns = Corpus.c06SplitAssign(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val holdoutDups = dup.map(_._1).filter(id => assigns(id) != "train")
    val minTrainDup = dup.map(_._1).filter(id => assigns(id) == "train").min
    val got = Corpus.c07Detail(spark, dir)
      .select("holdout_doc_id", "train_doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got.map(_._1) === holdoutDups.sorted,
      "exactly the holdout-side duplicates must be flagged")
    assert(got.forall(_._2 === minTrainDup),
      "each leak must name the smallest train collider")
    assert(holdoutDups.nonEmpty,
      "fixture must actually place duplicates across the boundary " +
        "(400 ids ≈ 8 expected holdout hits; md5 is fixed, so this is " +
        "deterministic — if it ever fails, widen the id range)")
    // the gated summary reconciles with the detail on the same corpus
    val summary = Corpus.c07SplitLeak(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val allHoldout = assigns.count(_._2 != "train").toLong
    assert(summary.values.map(_._1).sum === allHoldout)
    assert(summary.values.map(_._2).sum === holdoutDups.size.toLong)
    // a clean corpus reports zero leaks as a positive fact, not no rows
    val cleanOnly = docsDir(clean)
    val cleanSum = Corpus.c07SplitLeak(spark, cleanOnly).collect()
    assert(cleanSum.forall(_.getLong(2) === 0L) )
  }

  test("c11 length batches: octave ceilings exact at the power-of-two " +
    "boundaries, capacity fills in doc_id order") {
    // costs 10, 1 (empty), 16 -> pad 16; 17, 32 -> pad 32; 33 -> pad 64
    val dir = docsDir(Seq(
      (0L, words(10), "en", "a"), (1L, "", "en", "a"),
      (2L, words(16), "en", "a"), (3L, words(17), "en", "a"),
      (4L, words(32), "en", "a"), (5L, words(33), "en", "a")))
    val got = Corpus.c11LengthBatches(spark, dir).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (0L, 16L, 10L, 0L, 6L), (1L, 16L, 1L, 0L, 15L),
      (2L, 16L, 16L, 0L, 0L), (3L, 32L, 17L, 0L, 15L),
      (4L, 32L, 32L, 0L, 0L), (5L, 64L, 33L, 0L, 31L)))
  }

  test("c11: batch capacity is budget div pad_len, sequential in rank") {
    // 300 docs of 20 tokens -> pad 32, capacity 4096/32 = 128:
    // ids 0-127 -> batch 0, 128-255 -> 1, 256-299 -> 2
    val dir = docsDir((0L until 300L).map(i => (i, words(20), "en", "a")))
    val seqs = Corpus.c11LengthBatches(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(seqs(0L) === 0L && seqs(127L) === 0L)
    assert(seqs(128L) === 1L && seqs(255L) === 1L)
    assert(seqs(256L) === 2L && seqs(299L) === 2L)
  }

  test("c11 on the sf table: two-level rank equals the naive per-octave " +
    "window; waste bounded by half the pad") {
    val got = Corpus.c11LengthBatches(spark, sfDir)
    val toks = greatest(size(filter(split(lower(col("text")), " "),
      w => length(w) > 0)).cast("bigint"), lit(1L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pad_len")).orderBy(col("doc_id"))
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), toks.as("cost"))
      .withColumn("pad_len",
        expr("CASE WHEN cost <= 16 THEN CAST(16 AS BIGINT) " +
          "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(cost - 1))) END"))
      .withColumn("batch_seq",
        expr("(row_number() OVER (PARTITION BY pad_len ORDER BY doc_id)" +
          " - 1) div greatest(1, 4096 div pad_len)"))
      .select(col("doc_id"), col("pad_len"), col("cost").as("n_tokens"),
        col("batch_seq"), (col("pad_len") - col("cost")).as("waste"))
    assert(got.except(naive).count() === 0L &&
      naive.except(got).count() === 0L,
      "decomposed per-octave rank must equal the single-window form")
    // octave padding wastes strictly less than half the pad (pad/2 < cost)
    // except in the floor-16 bucket, where tiny docs may waste up to 15
    val bad = got.where(col("pad_len") > 16 &&
      col("waste") * 2 >= col("pad_len")).count()
    assert(bad === 0L, "octave ceiling must be the TIGHT power of two")
  }

  test("c05 eval: concat fills at least as densely as greedy; " +
    "straddles only on the concat row") {
    val rows = Corpus.c05PackEval(spark, sfDir).orderBy("method").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("concat", "greedy"))
    val Array(concatRow, greedyRow) = rows
    assert(concatRow.getDouble(5) >= greedyRow.getDouble(5),
      "concat-and-chunk can't waste more than first-fit")
    assert(greedyRow.getLong(3) === 0L, "greedy never straddles")
    assert(concatRow.getLong(1) <= greedyRow.getLong(1),
      "concat can't need more packs than greedy")
    assert(concatRow.getLong(2) === greedyRow.getLong(2),
      "both methods must pack every document")
  }
}
