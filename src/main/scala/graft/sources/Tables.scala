package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table loaders for the driver-generated test tables.
  *
  * Mirrors the reference's ingest surface (cherry `ingest.Query` field
  * selection, see /root/reference/src/cherry_pipelines/evm/erc20_transfers.py:86-116):
  * callers project the columns they need and Catalyst pushes the pruning +
  * predicates into the parquet scan. At cluster scale the same loaders work
  * unchanged against a directory of many files.
  */
object Tables {
  /** Older driver-generated events.parquet stored TIMESTAMP(NANOS), which
    * Spark's parquet reader rejects unless nanos are read as long (legacy
    * conf); newer generations store plain TIMESTAMP(MICROS), which Spark
    * reads as TIMESTAMP_NTZ. The ONE copy of the load-time contract every
    * events reader (batch loader, file stream, pipeline demos) shares:
    * whatever the file holds, `ts` comes out as a session-zone (UTC)
    * microsecond TimestampType — the type the DuckDB oracle compares at.
    */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => // TIMESTAMP_NTZ: session tz is pinned UTC, so the cast
                // preserves the wall-clock value the oracle sees
        df.withColumn("ts", expr("cast(ts as timestamp)"))
    }
}

final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def eventsRaw: DataFrame = {
    Tables.enableNanosAsLong(spark)
    Tables.normalizeEventTs(t("events"))
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = eventsRaw
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
