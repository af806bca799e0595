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

    // a crashed query must not masquerade as a fast one: failures report
    // -1 in the per-query map, are excluded from the total, and are
    // listed so "total improved" can never mean "half the queries died"
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1") }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
