package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Temporal semantics (date_trunc buckets, date→timestamp casts, event
    * ts normalization) are defined in UTC — the oracles compare naive
    * timestamps. Enforced here on whatever session the driver hands us,
    * not just in our own builders. */
  private def utc(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    utc(spark)
    operators.Relational.q01AggFilter(spark, "/root/testdata/sf0.001")
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (k, f) =>
      k -> { (s: SparkSession, d: String) => utc(s); f(s, d) }
    }
  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Skew.queries ++
      operators.DomainFunctions.queries ++
      operators.TextAnalysis.queries ++
      operators.Corpus.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Pipelines.queries ++
      operators.SvmInstr.queries ++
      streaming.EventStreams.queries ++
      sinks.Writers.queries ++
      sinks.ClickHouseDdl.queries ++
      sinks.ClickHouseHttpQuery.queries ++
      pipeline.Incremental.queries ++
      pipeline.Orchestrator.queries ++
      pipeline.Providers.queries ++
      sources.ArrowHttp.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      operators.Skew.oracle ++
      operators.DomainFunctions.oracle ++
      operators.TextAnalysis.oracle ++
      operators.Corpus.oracle ++
      operators.Dedup.oracle ++
      operators.Similarity.oracle ++
      operators.Multimodal.oracle ++
      operators.Pipelines.oracle ++
      operators.SvmInstr.oracle ++
      streaming.EventStreams.oracle ++
      sinks.Writers.oracle ++
      sinks.ClickHouseDdl.oracle ++
      sinks.ClickHouseHttpQuery.oracle ++
      pipeline.Incremental.oracle ++
      pipeline.Orchestrator.oracle ++
      pipeline.Providers.oracle ++
      sources.ArrowHttp.oracle
}
