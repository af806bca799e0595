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

    // median-of-N per query (N=3 default): a host-contention spike during
    // one alphabetical span cannot distort the round artifact (round 1
    // shipped 90 s where quiet runs measure ~56 s). The per-query min is
    // reported too — the best observed single-node throughput.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.trim.toIntOption).getOrElse(3).max(1)

    // a crashed query must not masquerade as a fast one: failures report
    // -1 in the per-query map, are excluded from the total, and are
    // listed so "total improved" can never mean "half the queries died"
    // optional args = query-name filter for fast local iteration; the
    // driver invokes with no args and benches everything
    val only = args.toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — a typo here " +
        "would otherwise bench nothing and report a vacuous total")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { run(fn); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None }
      }
      val ok = times.size == reps
      val sorted = times.sorted
      val median = if (sorted.isEmpty) -1.0 else sorted(sorted.size / 2)
      val min = if (sorted.isEmpty) -1.0 else sorted.head
      (name, median, min, ok)
    }
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, med, _, ok) =>
      "\"" + k + "\":" + (if (ok) fmt(med) else "-1") }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, mn, ok) =>
      "\"" + k + "\":" + (if (ok) fmt(mn) else "-1") }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._4).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.filter(_._4).map(_._2).sum
    val totalMin = results.filter(_._4).map(_._3).sum
    println(f"""{"metric":"total_median_of_$reps%d","value":$total%.3f,"unit":"sec","total_min":$totalMin%.3f,"queries":$qs,"queries_min":$qsMin,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
