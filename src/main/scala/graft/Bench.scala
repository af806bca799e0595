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
    // shuffle partitions must scale with DATA, not cores: 32 partitions
    // of a 600M-row sort are ~19M wide rows each and 32 of them run
    // concurrently — the sf100 rehearsal OOM'd exactly there. The knob
    // defaults to cores (right at the driver's SFs) and is raised per
    // run at rehearsal scale; AQE coalesces small shuffles back down, so
    // over-provisioning costs little.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // A 161-query suite in one JVM accumulates weakly-referenced state
      // (localCheckpoint blocks, shuffle files) that Spark's
      // ContextCleaner only reaps after a JVM GC; on a large heap GC may
      // not fire for the whole run and late queries degrade behind the
      // pile-up (measured: the same 4 queries 293 s inside a full sf1
      // sweep vs 12 s isolated). The default periodic-GC interval is
      // 30 min — longer than the suite; force a reap every 2 min.
      .config("spark.cleaner.periodicGC.interval", "2min")
      // split small files finer than the 128 MB default: the DRIVER sf
      // dirs hold one small file per table (documents at sf0.1 is
      // ~600 KB), and one scan partition serializes every per-doc kernel
      // behind one core. 8 MB splits give the 32 cores work at every SF;
      // rehearsal corpora shard each table as a directory of per-copy
      // files, so file-level parallelism grows with SF and this knob
      // only sub-splits within parts.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // staged (localCheckpoint) fact slices — the d-family
      // pre-collapse — overflow memory onto disk as RDD blocks, which
      // Spark leaves UNCOMPRESSED by default; at the sf100 rehearsal
      // that raw spill costs more scratch than the work it saves
      .config("spark.rdd.compress", "true")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // st-family wall times are dominated by the micro-batch scheduling
    // floor (forced AvailableNow triggers + awaitTermination), not
    // compute. This listener accumulates the engine's own
    // triggerExecution durations so BENCH_FULL can report actual batch
    // EXECUTION seconds beside wall seconds per streaming query.
    // Progress events arrive on Spark's ASYNC listener bus, so durations
    // are keyed by streaming-query run id and attributed to the bench
    // entry that STARTED that run (QueryStartedEvent is delivered
    // synchronously on the starting thread) — a late-arriving event can
    // never leak into the next query's number, and a batch query (which
    // starts no runs) can never be misclassified as streaming.
    val execByRun =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    val startedRuns =
      new java.util.concurrent.ConcurrentLinkedQueue[java.util.UUID]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = {
          startedRuns.add(e.runId): Unit
        }
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val d = e.progress.durationMs.get("triggerExecution")
          if (d != null)
            execByRun.merge(e.progress.runId, d.longValue(),
              (a, b) => a + b): Unit
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })

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
    final case class R(name: String, median: Double, min: Double,
      max: Double, streamExecSec: Double, ok: Boolean)
    val results = selected.map { case (name, fn) =>
      startedRuns.clear()
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
      val max = if (sorted.isEmpty) -1.0 else sorted.last
      // per-rep average of the engine-reported batch execution time over
      // the runs THIS entry started — 0 for batch queries, the honest
      // compute number for st-family. A short drain gives the async bus
      // time to flush the final progress events of just-terminated runs.
      val myRuns = {
        import scala.jdk.CollectionConverters._
        startedRuns.iterator().asScala.toSeq
      }
      if (myRuns.nonEmpty) Thread.sleep(150)
      val exec = myRuns
        .map(id => Option(execByRun.get(id)).map(_.longValue()).getOrElse(0L))
        .sum / 1e3 / reps
      // a query's cached tables must not ride into the next query's
      // measurement (or occupy storage memory for the rest of the suite)
      spark.catalog.clearCache()
      // memory-sink temp views (runToTable's complete/update outputs)
      // hold their full result rows on the DRIVER via the registered
      // MemorySink — 28 streaming queries × reps of them otherwise ride
      // to JVM exit and squeeze the late-suite heap. The output has been
      // consumed by the noop write above; drop the view to free the sink.
      spark.catalog.listTables().collect()
        .filter(t => t.name.startsWith("graft_stream_") ||
          t.name.startsWith("graft_http_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name): Unit)
      // localCheckpoint blocks (the d-family loops, pre-collapse stages)
      // are NOT cleared by clearCache() — they sit in the unified memory
      // region until the weak-ref cleaner happens to reap them, squeezing
      // execution memory for every later query (measured at sf10: the
      // same flagged queries run 2-5x faster isolated than late in the
      // suite). Drop them eagerly; nothing holds a reference across
      // queries by design.
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      // scratch sinks (streaming outputs, k-family tables) are consumed
      // by the noop write above; dropping them now keeps suite disk flat
      // — the sf100 ladder otherwise accumulates fact-scale sinks per
      // query per rep and exhausts the volume mid-suite (round 9's
      // 38-failure run). The shared chunk staging is pinned and survives.
      graft.Scratch.reap()
      // stderr progress line: long full-suite runs (sf1/sf10 rehearsals)
      // are otherwise silent until the final headline JSON
      System.err.println(f"[bench] $name%-28s median $median%7.2f s  min $min%7.2f s")
      R(name, median, min, max, exec, ok)
    }
    // Sustained-rate streaming benchmark: the st-family entries above are
    // forced-batch correctness shapes whose wall time is a scheduling
    // floor; this drives a watermarked windowed aggregation from a rate
    // source at a FIXED offered load for a fixed horizon and reports the
    // engine's own per-batch execution p50/p95 + achieved rows/sec — the
    // numbers that actually regress when a streaming plan gets slower.
    val rateBench: Option[(Double, Double, Double, Double)] =
      if (sys.env.get("SPARK_GRAFT_SKIP_RATE").isDefined) None
      else try {
        import org.apache.spark.sql.functions._
        val offered = 200000
        val rows = spark.readStream.format("rate")
          .option("rowsPerSecond", offered.toString)
          .option("numPartitions", cpus).load()
        val agg = rows
          .withWatermark("timestamp", "2 seconds")
          .groupBy(window(col("timestamp"), "1 second"),
            pmod(col("value"), lit(64)).as("k"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        val q = agg.writeStream.format("noop").outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger
            .ProcessingTime("500 milliseconds"))
          .start()
        Thread.sleep(15000)
        val prog = q.recentProgress.toSeq
        q.stop()
        // drop the cold-start batches; an empty tail means the host is
        // too contended to say anything — report nothing, not noise
        val steady = prog.drop(4).filter(_.numInputRows > 0)
        if (steady.isEmpty) None
        else {
          val execMs = steady.flatMap(p =>
            Option(p.durationMs.get("triggerExecution")).map(_.doubleValue()))
            .sorted
          def pct(s: Seq[Double], p: Double): Double =
            if (s.isEmpty) -1.0
            else s(math.min(s.size - 1, (p * s.size).toInt))
          val achieved = steady.map(_.processedRowsPerSecond)
            .filterNot(_.isNaN).sorted
          Some((offered.toDouble, pct(achieved, 0.5),
            pct(execMs, 0.5), pct(execMs, 0.95)))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] rate bench FAILED: ${e.getMessage}")
        None
      }

    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def qmap(f: R => String, keep: String => Boolean): String =
      results.collect { case r if keep(r.name) =>
        "\"" + r.name + "\":" + f(r) }.mkString("{", ",", "}")
    val failedNames = results.filterNot(_.ok).map(_.name)
    val failed = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The driver's tail window is ~2000 chars; a long failure list would
    // push the front of the headline JSON out of it and break parsing.
    // The headline line carries a bounded sample + count; BENCH_FULL.json
    // keeps the full list.
    val failedBrief = (failedNames.take(8).map("\"" + _ + "\"") ++
      (if (failedNames.size > 8) Seq("\"...\"") else Nil))
      .mkString("[", ",", "]")
    val total = results.filter(_.ok).map(_.median).sum
    val totalMin = results.filter(_.ok).map(_.min).sum
    // The driver keeps only the FINAL ~2000 chars of output, so the
    // one-line JSON must (a) be the last thing printed — after
    // spark.stop(), whose streaming-teardown WARNs otherwise land after
    // it — and (b) stay well under that window. The inline `queries` map
    // therefore carries a fixed headline subset (one per operator
    // family); the full per-query median/min maps go to BENCH_FULL.json
    // next to the repo for PERF.md and judge spot-checks.
    val headline = Set(
      "q01_agg_filter", "q05_multi_join_agg", "q10_adjacency_join",
      "q11_range_window", "q23_asof_native", "q28_window_analytics",
      "d01_dedup_exact", "d02_dedup_minhash", "d06_dedup_embedding_lsh",
      "d14_dedup_assign",
      "s01_ann_bruteforce", "s05_ann_pq", "t03_token_count",
      "t10_contamination", "p01_swaps_pipeline", "p03_erc20_pipeline",
      "p11_curation_pipeline", "st01_stream_window", "st04_stream_join",
      "k01_parquet_sink", "k04_bucketed_join")
    val med = { r: R => if (r.ok) fmt(r.median) else "-1" }
    val mn = { r: R => if (r.ok) fmt(r.min) else "-1" }
    val mx = { r: R => if (r.ok) fmt(r.max) else "-1" }
    val ex = { r: R => if (r.ok) fmt(r.streamExecSec) else "-1" }
    val streaming = results.filter(r => r.streamExecSec > 0.0).map(_.name).toSet
    val rate = rateBench.map { case (off, ach, p50, p95) =>
      f""","rate_bench":{"offered_rows_per_sec":$off%.0f,"achieved_rows_per_sec":$ach%.0f,"batch_exec_p50_ms":$p50%.0f,"batch_exec_p95_ms":$p95%.0f}"""
    }.getOrElse("")
    val full =
      f"""{"metric":"total_median_of_$reps%d","value":$total%.3f,"unit":"sec","total_min":$totalMin%.3f,"n_queries":${results.size}%d,"queries":${qmap(med, _ => true)},"queries_min":${qmap(mn, _ => true)},"queries_max":${qmap(mx, _ => true)},"stream_exec_sec":${qmap(ex, streaming)}$rate,"failed":$failed,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    val headlineJson =
      f"""{"metric":"total_median_of_$reps%d","value":$total%.3f,"unit":"sec","total_min":$totalMin%.3f,"n_queries":${results.size}%d,"queries":${qmap(med, headline)},"n_failed":${failedNames.size}%d,"failed":$failedBrief,"full":"BENCH_FULL.json","sf":"$sfDir"}"""
    // Belt and braces for the driver's last-line parse (build.sbt also
    // suppresses sbt's [success] trailer): the headline lands in a fixed
    // file too.
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_HEADLINE.json"),
      (headlineJson + "\n").getBytes("UTF-8"))
    println(headlineJson)
  }
}
