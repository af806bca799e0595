package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print a registered query's formatted physical plan at an
  * arbitrary SF dir under Bench's exact session geometry — what the
  * static sfDir-scale plan audits can't show (AQE decisions, join
  * strategies, bucketed-scan recognition at rehearsal row counts).
  * Usage: PlanDump <sfDir> <query> [mode]  (mode: formatted|extended).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [mode]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // one clustering, many key-sets: hash(slot) co-locates (slot, idx)
      // too, but the conservative default REFUSES subset co-partitioning
      // for joins (a skew guard) and re-shuffles + re-sorts both sides on
      // the full key set — at sf100 that silently moved p05's whole fact
      // a second time. The rehearsal keys are uniform; let a staged
      // single-key clustering serve every join whose keys extend it.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // ...and let a staged bucket table's per-bucket sortBy feed the
      // merge joins: off by default since 3.0 (multi-file buckets would
      // need a merge-sort) but Spark still guards on one-file-per-bucket,
      // which the stageBucketed writer guarantees by construction
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.rdd.compress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.length > 2) args(2) else "formatted"
    val df = SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.explainString(ExplainMode.fromString(mode)))
    spark.stop()
  }
}
