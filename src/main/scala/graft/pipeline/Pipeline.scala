package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k03 — Pipeline/Step composition + incremental resume (SURVEY.md §2).
  *
  * The reference's run loop (cherry cc.Pipeline of cc.Steps, driven by
  * scripts/main.py) processes half-open block ranges and resumes from
  * `MAX(block)+1` read back from the sink
  * (/root/reference/src/cherry_pipelines/db.py:30-45 get_next_block).
  * Spark-first: a Step is just DataFrame → DataFrame (so Catalyst fuses the
  * whole chain into one plan — steps are *logical* structure, not physical
  * stages), and the resume point is one agg over the sink's own parquet.
  *
  * At scale the resume agg is cheap: with k01's layout the sink is
  * partitioned, and max(key) over parquet reads row-group statistics, not
  * data. Each increment appends new files only — no rewrite of history,
  * exactly the MergeTree-insert semantics the reference relies on.
  */
object Incremental {

  final case class Step(name: String, f: DataFrame => DataFrame)

  final case class Pipeline(steps: Seq[Step]) {
    def run(in: DataFrame): DataFrame = steps.foldLeft(in)((d, s) => s.f(d))
  }

  /** MAX(key)+1 over the existing sink; `from` (default 0) when the sink
    * doesn't exist yet — db.py:30-45's contract.
    */
  def nextStart(spark: SparkSession, sinkPath: String, keyCol: String,
      from: Long = 0L): Long =
    try {
      val r = spark.read.parquet(sinkPath).agg(max(col(keyCol))).head()
      if (r.isNullAt(0)) from else r.getLong(0) + 1L
    } catch {
      // ONLY a missing sink means "first run" — swallowing other errors
      // (transient FS, corrupt footer, wrong key type) would silently
      // reset the resume point to 0 and re-append the entire history
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => from
    }

  /** MIN(key) over the sink (db.py:8-27 get_min_block's probe — used by
    * the reference to detect backfill gaps); None when the sink is absent
    * or empty. */
  def minKey(spark: SparkSession, sinkPath: String,
      keyCol: String): Option[Long] =
    try {
      val r = spark.read.parquet(sinkPath).agg(min(col(keyCol))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => None
    }

  /** One incremental tick: keep only source rows at/after the resume point,
    * run the pipeline, append to the sink. Mirrors the reference loop body
    * (swap_prices.py:59-116): read [start, tip], transform, insert.
    */
  def runIncrement(source: DataFrame, sinkPath: String, keyCol: String,
      pipeline: Pipeline): Long = {
    val start = nextStart(source.sparkSession, sinkPath, keyCol)
    val batch = pipeline.run(source.filter(col(keyCol) >= start))
    batch.write.mode("append").parquet(sinkPath)
    start
  }

  // ---- driver-verified query entry ----

  /** k03 as a query: two incremental ticks against a fresh sink — first a
    * partial source (the "yesterday" run), then the full source (today's
    * tick appends only the new keys). The oracle is the one-shot batch
    * answer: incremental ∘ resume must equal batch — the invariant the
    * whole reference architecture rests on.
    */
  def k03Pipeline(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.sources.Tables(spark, dir).events
    val sink = graft.Scratch.dir("k03_") + "/sink"
    val pipe = Pipeline(Seq(
      Step("project", _.select(col("event_id"), col("user_id"),
        col("event_type"), col("value"))),
      Step("boost", _.withColumn("boosted", col("value") * 2.0)),
      Step("drop_raw", _.drop("value"))))
    runIncrement(events.filter(col("event_id") < 500), sink, "event_id", pipe)
    runIncrement(events, sink, "event_id", pipe)
    spark.read.parquet(sink).orderBy(col("event_id"))
  }

  /** k24 — the MIN-probe half of db.py's public API (db.py:8-27
    * get_min_block): MIN(key) over the sink per lifecycle phase, None
    * (SQL NULL) while the sink is absent/empty, beside the MAX(key)+1
    * resume point q12/k03 already gate (db.py:30-45's "no rows → start
    * from 0"). Three probes — empty sink, after a partial load, after
    * the full load — so both contracts are pinned across the sink's
    * whole lifecycle, not just the steady state. The probes are
    * row-group-statistics reads at scale, same as nextStart.
    */
  def k24MinBlockProbe(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.sources.Tables(spark, dir).events
    val sink = graft.Scratch.dir("k24_") + "/sink"
    def probe(phase: String): (String, Option[Long], Long) =
      (phase, minKey(spark, sink, "event_id"),
        nextStart(spark, sink, "event_id"))
    val empty = probe("1_empty")
    events.filter(col("event_id") >= 100 && col("event_id") < 500)
      .write.mode("append").parquet(sink)
    val partial = probe("2_partial")
    events.filter(col("event_id") >= 500).write.mode("append").parquet(sink)
    val full = probe("3_full")
    import spark.implicits._
    Seq(empty, partial, full).toDF("phase", "min_key", "next_start")
      .orderBy(col("phase"))
  }

  val oracle: Map[String, String] = Map(
    "k03_pipeline" ->
      """SELECT event_id, user_id, event_type, value * 2.0 AS boosted
        |FROM events ORDER BY event_id""".stripMargin,
    "k24_min_block_probe" ->
      """SELECT '1_empty' AS phase, CAST(NULL AS BIGINT) AS min_key,
        |  CAST(0 AS BIGINT) AS next_start
        |UNION ALL
        |SELECT '2_partial', MIN(event_id), MAX(event_id) + 1
        |FROM events WHERE event_id >= 100 AND event_id < 500
        |UNION ALL
        |SELECT '3_full', MIN(event_id), MAX(event_id) + 1
        |FROM events WHERE event_id >= 100
        |ORDER BY phase""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k03_pipeline" -> (k03Pipeline _),
    "k24_min_block_probe" -> (k24MinBlockProbe _)
  )
}
