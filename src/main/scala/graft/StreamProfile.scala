package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query under Bench's session geometry and
  * print the engine's own per-micro-batch duration breakdown
  * (durationMs: triggerExecution / queryPlanning / addBatch / getBatch /
  * latestOffset / walCommit / commitOffsets) for every streaming run the
  * query starts — the numbers that say where a streaming query's wall
  * time actually goes (guide §1: measure first). Batch-only queries just
  * report wall time.
  *
  * Usage: StreamProfile <sfDir> <query> [reps]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamProfile <sfDir> <query> [reps]")
    val sfDir = args(0)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.rdd.compress", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
      "latestOffset", "addBatch", "walCommit", "commitOffsets")
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val d = e.progress.durationMs
          val parts = keys.map { k =>
            val v = d.get(k); f"$k=${if (v == null) -1L else v.longValue()}%d"
          }.mkString(" ")
          System.err.println(
            s"[prof] batch=${e.progress.batchId} rows=${e.progress.numInputRows} $parts")
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })
    val fn = SparkEntry.queries(args(1))
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[prof] rep $r wall ${dt}%.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      graft.Scratch.reap()
    }
    spark.stop()
  }
}
