package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, In, IsNotNull, LessThan}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowHttpScanBuilder, ArrowHttpStub}

/** The HTTP/Arrow ingest source (k26): protocol round trip against the
  * loopback portal, server-side pushdown, pagination, range clamping,
  * and partition geometry. */
class ArrowHttpSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  private val dir = SparkSessionFixture.sfDir

  private def readHttp(url: String, bpp: Long = 8192L) =
    spark.read.format("arrow-http")
      .option("url", url)
      .option("blocksPerPartition", bpp.toString)
      .load()

  test("full round trip: every column survives the wire bit-for-bit") {
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      val viaHttp = readHttp(stub.url)
        .collect().sortBy(_.getLong(0))
      val direct = graft.sources.Tables(spark, dir).events
        .where(col("event_id") < 60000L)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .collect().sortBy(_.getLong(0))
      assert(viaHttp.length === direct.length)
      viaHttp.zip(direct).foreach { case (a, b) => assert(a === b) }
    } finally stub.stop()
  }

  test("range + type filters and projection are pushed into the request") {
    val opts = new CaseInsensitiveStringMap(
      Map("url" -> "http://unused", "blocksPerPartition" -> "8192").asJava)
    val b = new ArrowHttpScanBuilder(opts)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("event_id", 100L),
      LessThan("event_id", 500L),
      In("event_type", Array[Any]("click", "view")),
      IsNotNull("event_type")))
    // the three provider-expressible predicates are consumed whole;
    // isnotnull stays Spark-side
    assert(residual.toSeq === Seq(IsNotNull("event_type")))
    assert(b.pushedFilters().length === 3)
    b.pruneColumns(StructType(Seq(
      StructField("event_type", StringType), StructField("event_id", LongType))))
    val d = b.build().description()
    assert(d.contains("blocks=[100,500)"), d)
    assert(d.contains("types=[click,view]"), d)
    // pruned to the two wire columns, in canonical order
    assert(d.contains("fields=[event_id,event_type]"), d)
  }

  test("pushdown survives the DataFrame API end to end") {
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      val df = readHttp(stub.url)
        .where(col("event_id") >= 100L && col("event_id") < 500L)
        .where(col("event_type") === "click")
        .select("event_id", "event_type")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("blocks=[100,500)"), plan)
      assert(plan.contains("types=[click]"), plan)
      assert(plan.contains("fields=[event_id,event_type]"), plan)
      val direct = graft.sources.Tables(spark, dir).events
        .where(col("event_id") >= 100L && col("event_id") < 500L &&
          col("event_type") === "click")
        .count()
      assert(df.count() === direct)
      assert(direct > 0)
    } finally stub.stop()
  }

  test("responses paginate: a small page cap forces multiple /query round trips") {
    val stub = ArrowHttpStub.start(spark, dir, pageRows = 50)
    try {
      // one partition covering all 1000 sf0.001 blocks → ≥ 20 pages
      val n = readHttp(stub.url, bpp = 1000000L).count()
      assert(n === 1000L)
      assert(stub.queryRequests >= 20,
        s"expected ≥20 paginated requests, saw ${stub.queryRequests}")
    } finally stub.stop()
  }

  test("requested range is clamped to the provider's served window") {
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      // sf0.001 serves blocks [0, 1000); ask far beyond both edges
      val df = spark.read.format("arrow-http")
        .option("url", stub.url)
        .option("fromBlock", "-5000")
        .option("toBlock", "999999")
        .load()
      assert(df.count() === 1000L)
      // and an out-of-window range plans zero partitions, zero requests
      val before = stub.queryRequests
      val empty = spark.read.format("arrow-http")
        .option("url", stub.url)
        .option("fromBlock", "50000")
        .load()
      assert(empty.count() === 0L)
      assert(stub.queryRequests === before,
        "an unservable range must not issue /query calls")
    } finally stub.stop()
  }

  test("block ranges split into parallel input partitions") {
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      val df = readHttp(stub.url, bpp = 128L)
      // [0, 1000) at 128 blocks/partition → 8 tasks
      assert(df.rdd.getNumPartitions === 8)
      assert(df.count() === 1000L)
    } finally stub.stop()
  }

  test("k26 gated query matches the direct-parquet aggregation") {
    val viaHttp = graft.sources.ArrowHttp
      .k26HttpArrowIngest(spark, dir).collect()
    val direct = graft.sources.Tables(spark, dir).events
      .where(col("event_id") >= 100L && col("event_id") < 50000L)
      .where(col("event_type").isin("click", "purchase", "view"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("ts")).as("max_ts"))
      .orderBy(col("event_type"))
      .collect()
    assert(viaHttp.length === 3) // click, purchase, view all present
    assert(viaHttp.toSeq === direct.toSeq)
  }

  test("st22 streaming drain runs as multiple bounded micro-batches") {
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      import org.apache.spark.sql.streaming.Trigger
      val agg = spark.readStream.format("arrow-http")
        .option("url", stub.url)
        .option("maxBlocksPerTrigger", "100")
        .load()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.format("memory").queryName("st22_spec")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // 1000 blocks at ≤100/trigger → ≥10 committed batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 10, s"expected ≥10 micro-batches, saw $batches")
      val total = spark.table("st22_spec").agg(sum(col("n"))).head.getLong(0)
      assert(total === 1000L)
    } finally stub.stop()
  }

  test("streaming offsets checkpoint: a restart resumes at next_block exactly once") {
    val stub = ArrowHttpStub.start(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("arrowhttp-ck").toString
    try {
      import org.apache.spark.sql.streaming.Trigger
      def drain(toBlock: Long): Unit = {
        val q = spark.readStream.format("arrow-http")
          .option("url", stub.url)
          .option("toBlock", toBlock.toString)
          .load()
          .select("event_id", "event_type")
          .writeStream.format("parquet")
          .option("path", s"$root/data")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain(400L) // first run ingests [0, 400)
      drain(1000L) // restart widens the window: must resume AT 400
      val got = spark.read.parquet(s"$root/data")
      assert(got.count() === 1000L, "resume must not skip blocks")
      assert(got.select("event_id").distinct().count() === 1000L,
        "resume must not replay already-committed blocks")
    } finally stub.stop()
  }

  test("st22 gated query matches the direct-parquet aggregation") {
    val viaStream = graft.sources.ArrowHttp
      .st22StreamHttpIngest(spark, dir).collect()
    val direct = graft.sources.Tables(spark, dir).events
      .where(col("event_id") < 30000L &&
        col("event_type").isin("click", "view"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(38,6)")).cast("double")
          .as("sum_value"))
      .orderBy(col("event_type"))
      .collect()
    assert(viaStream.toSeq === direct.toSeq)
    assert(viaStream.length === 2)
  }

  test("a typed EvmQuery compiles to wire-level pushdown against the portal") {
    import graft.pipeline.IngestRequest._
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      val q = EvmQuery(
        range = BlockRange(100L, Some(700L)),
        logs = Seq(LogRequest(topic0 = Seq("click", "purchase"))),
        fields = EvmFields(log = Seq("event_id", "event_type", "value")))
      val df = compileEvmHttp(spark, stub.url, q)
      val plan = df.queryExecution.executedPlan.toString
      // the TYPED request's range/membership/selection all reached the
      // HTTP request, not a Spark-side filter
      assert(plan.contains("blocks=[100,700)"), plan)
      assert(plan.contains("types=[click,purchase]"), plan)
      assert(plan.contains("fields=[event_id,event_type,value]"), plan)
      val direct = graft.sources.Tables(spark, dir).events
        .where(col("event_id") >= 100L && col("event_id") < 700L &&
          col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type", "value")
        .collect().sortBy(_.getLong(0))
      val got = df.collect().sortBy(_.getLong(0))
      assert(got.length === direct.length && got.length > 0)
      got.zip(direct).foreach { case (a, b) => assert(a === b) }
    } finally stub.stop()
  }

  test("flaky portal: every 2nd /query 503s, retry still lands exactly") {
    val stub = ArrowHttpStub.start(spark, dir, pageRows = 100,
      failEveryNth = 2)
    try {
      val got = readHttp(stub.url, bpp = 512)
        .where(col("event_id") >= 0 && col("event_id") < 600)
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"))
        .collect()(0)
      val want = spark.read.parquet(s"$dir/events.parquet")
        .where(col("event_id") >= 0 && col("event_id") < 600)
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"))
        .collect()(0)
      assert(got === want)
      // half the requests 503'd, so retries must have re-requested
      assert(stub.queryRequests >= 4,
        s"expected retried pages, saw ${stub.queryRequests} requests")
    } finally stub.stop()
  }

  test("bearer token from the environment rides every wire request") {
    sys.props("graft.portal.bearer") = "t0k3n"
    try {
      val stub = ArrowHttpStub.start(spark, dir)
      try {
        readHttp(stub.url).where(col("event_id") < 100).count(): Unit
        assert(stub.lastAuthHeader === Some("Bearer t0k3n"))
      } finally stub.stop()
    } finally sys.props -= "graft.portal.bearer"
  }

  test("no bearer configured -> no Authorization header on the wire") {
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      readHttp(stub.url).where(col("event_id") < 100).count(): Unit
      assert(stub.lastAuthHeader === None)
    } finally stub.stop()
  }

  test("the wire rejects unknown fields instead of serving garbage") {
    val stub = ArrowHttpStub.start(spark, dir)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${stub.url}/query"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            """{"from_block":0,"to_block":10,"fields":["nope"]}"""))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 500)
      assert(resp.body().contains("nope"))
    } finally stub.stop()
  }
}
