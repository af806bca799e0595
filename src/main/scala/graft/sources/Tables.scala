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
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects. Read nanos as long (legacy conf) and rebuild a microsecond
    * timestamp — lossless for this data (no sub-µs components), and µs is
    * what every other engine (and the DuckDB oracle) uses anyway.
    */
  private def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
