package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Funnel, Relational}

/** Behavior specs for the event-analytics operators q44 (windowed
  * funnel) and q45 (retention cohorts) — hand-computed chains on a
  * planted events table, including the chain-restart case that proves
  * the greedy fold's max-first-timestamp dominance is exact.
  */
class FunnelRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  private val sfDir = SparkSessionFixture.sfDir

  /** events.parquet with the driver's schema; ts as hours from t0. */
  private def eventsDir(rows: Seq[(Long, Long, Double, String)]): String = {
    val dir = Files.createTempDirectory("graft-funnel").toString
    val t0 = 1700000000000000L // micros
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.zipWithIndex.map { case ((user, _, hours, typ), i) =>
      Row(i.toLong, new Timestamp((t0 + (hours * 3600e6).toLong) / 1000L),
        user, typ, 1.0, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q44 funnel levels on hand-computed chains, incl. chain restart") {
    def e(u: Long, h: Double, t: String) = (u, 0L, h, t)
    val dir = eventsDir(Seq(
      // u1: clean 3-chain inside the window
      e(1, 0, "view"), e(1, 1, "click"), e(1, 2, "purchase"),
      // u2: click lands outside the 24 h window -> stuck at 1
      e(2, 0, "view"), e(2, 25, "click"),
      // u3: no click at all -> 1
      e(3, 0, "view"), e(3, 1, "purchase"),
      // u4: never views -> 0
      e(4, 0, "click"), e(4, 1, "purchase"),
      // u5: right events, wrong order -> only the view counts
      e(5, 0, "purchase"), e(5, 1, "click"), e(5, 2, "view"),
      // u6: chain spans 25 h total -> purchase misses the window -> 2
      e(6, 0, "view"), e(6, 23, "click"), e(6, 25, "purchase"),
      // u7: THE dominance case — only the chain restarting at the
      // second view reaches purchase inside 24 h -> 3
      e(7, 0, "view"), e(7, 10, "view"), e(7, 20, "click"),
      e(7, 30, "purchase"),
      // u8: unrelated types only -> 0
      e(8, 0, "error"), e(8, 1, "signup")))
    val got = Relational.q44Funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 1L, 6L -> 2L, 7L -> 3L, 8L -> 0L))
  }

  test("q48 K=5 funnel levels on hand-computed chains, incl. restart " +
    "dominance at depth 3") {
    def e(u: Long, h: Double, t: String) = (u, 0L, h, t)
    val dir = eventsDir(Seq(
      // u1: clean 5-chain inside the window
      e(1, 0, "signup"), e(1, 1, "view"), e(1, 2, "click"),
      e(1, 3, "purchase"), e(1, 4, "error"),
      // u2: the 5th step lands outside the 24 h window -> 4
      e(2, 0, "signup"), e(2, 1, "view"), e(2, 2, "click"),
      e(2, 3, "purchase"), e(2, 25, "error"),
      // u3: signup only -> 1
      e(3, 0, "signup"),
      // u4: starts mid-chain (no signup) -> 0
      e(4, 0, "view"), e(4, 1, "click"), e(4, 2, "purchase"),
      // u5: K-deep dominance — only the chain RESTARTING at the
      // second signup reaches purchase+error inside 24 h -> 5
      e(5, 0, "signup"), e(5, 1, "view"), e(5, 2, "click"),
      e(5, 10, "signup"), e(5, 11, "view"), e(5, 12, "click"),
      e(5, 26, "purchase"), e(5, 27, "error"),
      // u6: exact reverse order -> only the trailing signup counts
      e(6, 0, "error"), e(6, 1, "purchase"), e(6, 2, "click"),
      e(6, 3, "view"), e(6, 4, "signup")))
    val got = Relational.q48FunnelK(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 5L, 2L -> 4L, 3L -> 1L, 4L -> 0L,
      5L -> 5L, 6L -> 1L))
  }

  test("q44 is exactly funnelChain at K=3: the parameterized fold " +
    "reproduces the hand-written triple on the sf table") {
    val a = Relational.q44Funnel(spark, sfDir)
    val b = Relational.funnelChain(spark, sfDir, Funnel.chain3)
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("q44 on the sf table: levels monotone-populated and in range") {
    val levels = Relational.q44Funnel(spark, sfDir).collect()
      .map(_.getLong(1))
    assert(levels.nonEmpty && levels.forall(l => l >= 0 && l <= 3))
    // the synthetic corpus has heavy event traffic: someone converts
    assert(levels.max === 3L, "no user completed the funnel — suspicious")
  }

  test("st26 streaming funnel equals batch q44 on the sf table") {
    val stream = streaming.EventStreams.st26StreamFunnel(spark, sfDir)
    val batch = Relational.q44Funnel(spark, sfDir)
    assert(batch.count() > 0)
    assert(stream.except(batch).union(batch.except(stream)).count() === 0L,
      "incremental funnel diverged from the batch fold")
  }

  test("st26 carries chain state across micro-batch boundaries") {
    // user 1's chain spans the full ts range, so the ts-range chunking
    // (>=2 chunks) necessarily splits it: view lands in an earlier
    // trigger than the purchase — lost g-state would cap the level < 3
    def e(u: Long, h: Double, t: String) = (u, 0L, h, t)
    val filler = (10L to 29L).map(u => e(u, (u - 10L).toDouble, "error"))
    val dir = eventsDir(Seq(
      e(1, 0, "view"), e(1, 9, "click"), e(1, 19, "purchase")) ++ filler)
    val got = streaming.EventStreams.st26StreamFunnel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 3L, s"state lost across a chunk boundary: $got")
    assert(got.filterNot(_._1 == 1L).values.forall(_ == 0L))
  }

  test("st29 streaming K-funnel equals batch q48 on the sf table") {
    val stream = streaming.EventStreams.st29StreamFunnelK(spark, sfDir)
    val batch = Relational.q48FunnelK(spark, sfDir)
    assert(batch.count() > 0)
    assert(stream.except(batch).union(batch.except(stream)).count() === 0L,
      "incremental K-funnel diverged from the batch K-fold")
  }

  test("st29 carries the K-long state across micro-batch boundaries") {
    // user 1's 5-chain spans the full ts range, so the ts-range
    // chunking necessarily splits it across triggers: the signup lands
    // in an earlier trigger than the error — lost deep-state would cap
    // the level below 5
    def e(u: Long, h: Double, t: String) = (u, 0L, h, t)
    val filler = (10L to 29L).map(u => e(u, (u - 10L).toDouble, "error"))
    val dir = eventsDir(Seq(
      e(1, 0, "signup"), e(1, 4, "view"), e(1, 9, "click"),
      e(1, 14, "purchase"), e(1, 19, "error")) ++ filler)
    val got = streaming.EventStreams.st29StreamFunnelK(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 5L, s"K-state lost across a chunk boundary: $got")
    // a lone error (level-5 type) with no prior chain stays at 0
    assert(got.filterNot(_._1 == 1L).values.forall(_ == 0L))
  }

  test("q46 transitions: hand-computed counts, rows are a distribution") {
    def e(u: Long, h: Double, t: String) = (u, 0L, h, t)
    // u1: view->click->view->purchase; u2: view->click
    val dir = eventsDir(Seq(
      e(1, 0, "view"), e(1, 1, "click"), e(1, 2, "view"),
      e(1, 3, "purchase"), e(2, 0, "view"), e(2, 1, "click")))
    val got = Relational.q46PathTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // transitions: u1 v->c, c->v, v->p; u2 v->c. From 'view': 3 total.
    assert(got === Map(
      ("view", "click") -> (2L, 2.0 / 3.0),
      ("view", "purchase") -> (1L, 1.0 / 3.0),
      ("click", "view") -> (1L, 1.0)))
    // on the sf table: each from_type's outgoing p sums to ~1
    val sums = Relational.q46PathTransitions(spark, sfDir).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(3)).sum)
    sums.foreach { case (f, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"$f outgoing p sums to $s") }
  }

  test("st27 streaming transitions equal batch q46 on the sf table") {
    val stream = streaming.EventStreams.st27StreamTransitions(spark, sfDir)
    val batch = Relational.q46PathTransitions(spark, sfDir)
    assert(batch.count() > 0)
    assert(stream.except(batch).union(batch.except(stream)).count() === 0L,
      "incremental pairing diverged from the batch LAG")
  }

  test("st27 counts the boundary pair across micro-batches exactly once") {
    // u1's two events straddle the full ts range, so the ts-range
    // chunking splits them: the view->purchase pair exists ONLY as the
    // stored-state boundary pair — lost state drops it, replayed state
    // double-counts it
    def e(u: Long, h: Double, t: String) = (u, 0L, h, t)
    val filler = (0 until 20).map(i => e(10, i.toDouble, "error"))
    val dir = eventsDir(Seq(e(1, 0, "view"), e(1, 19, "purchase")) ++ filler)
    val got = streaming.EventStreams.st27StreamTransitions(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("view", "purchase")) === 1L, s"boundary pair wrong: $got")
    assert(got(("error", "error")) === 19L)
  }

  test("q47 sessionize: hand-computed gap splits, boundary gap exactly " +
    "30 min stays one session") {
    def e(u: Long, h: Double, t: String) = (u, 0L, h, t)
    val dir = eventsDir(Seq(
      // u1: 42-min gap splits; 12-min and 6-min gaps don't
      e(1, 0.0, "view"), e(1, 0.2, "click"),
      e(1, 0.9, "view"), e(1, 1.0, "click"),
      // u2: singleton session
      e(2, 5.0, "view"),
      // u3: gap EXACTLY 30 min -> NOT > gap -> one session
      e(3, 0.0, "view"), e(3, 0.5, "click")))
    val got = Relational.q47Sessionize(spark, dir).collect().map { r =>
      val t0 = 1700000000000L // ms
      (r.getLong(0),
        (r.getTimestamp(1).getTime - t0) / 60000L, // start, minutes
        (r.getTimestamp(2).getTime - t0) / 60000L, // end, minutes
        r.getLong(3))
    }.toSet
    assert(got === Set(
      (1L, 0L, 42L, 2L),   // 0h-0.2h, end = 12 min + 30
      (1L, 54L, 90L, 2L),  // 0.9h-1.0h, end = 60 min + 30
      (2L, 300L, 330L, 1L),
      (3L, 0L, 60L, 2L)))  // one session despite the 30-min gap
  }

  test("q47 equals st09's streaming session windows on the sf table") {
    val batch = Relational.q47Sessionize(spark, sfDir)
    val stream = streaming.EventStreams.st09SessionWindow(spark, sfDir)
    assert(batch.count() === stream.count())
    assert(batch.except(stream).count() === 0L,
      "batch sessionization must equal the streaming session_window set")
  }

  test("q45 retention: offset-0 is 1.0 by construction, ratios bounded") {
    val rows = Relational.q45Retention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, ret) = (r.getLong(1), r.getDouble(3))
      assert(ret > 0.0 && ret <= 1.0)
      if (off == 0L) assert(ret === 1.0,
        "every user is active in their own cohort week")
    }
  }
}
