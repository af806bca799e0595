package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{ClickHouseDdl, ClickHouseHttpQuery, ClickHouseHttpSink, ClickHouseHttpStub, RowBinary}

/** The ClickHouse HTTP wire layer (k27): the RowBinary codec pinned to
  * the PUBLIC format by golden byte vectors (never only by its own
  * round trip), the DDL-driven decode schema, partition-parallel
  * inserts, and the sharded readback. */
class ClickHouseHttpSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  private val dir = SparkSessionFixture.sfDir

  private def bytes(codec: RowBinary.Codec, v: Any): Seq[Int] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    codec.write(d, v)
    d.flush()
    out.toByteArray.toSeq.map(_ & 0xff)
  }

  test("golden bytes: UInt64/Int64 are 8 little-endian bytes") {
    // clickhouse.com/docs/interfaces/formats#rowbinary
    assert(bytes(RowBinary.LongCodec, 1L) ===
      Seq(0x01, 0, 0, 0, 0, 0, 0, 0))
    assert(bytes(RowBinary.LongCodec, 0x0102030405060708L) ===
      Seq(0x08, 0x07, 0x06, 0x05, 0x04, 0x03, 0x02, 0x01))
    assert(bytes(RowBinary.LongCodec, -1L) === Seq.fill(8)(0xff))
  }

  test("golden bytes: Float64 is IEEE-754 little-endian") {
    // 1.5 = 0x3FF8000000000000
    assert(bytes(RowBinary.Float64Codec, 1.5) ===
      Seq(0, 0, 0, 0, 0, 0, 0xf8, 0x3f))
  }

  test("golden bytes: String is LEB128 length + UTF-8") {
    assert(bytes(RowBinary.StringCodec, "ABC") ===
      Seq(0x03, 0x41, 0x42, 0x43))
    assert(bytes(RowBinary.StringCodec, "") === Seq(0x00))
    // 300 > 127 forces a 2-byte varint: 300 = 0b10_0101100 → AC 02
    val s300 = "x" * 300
    val b = bytes(RowBinary.StringCodec, s300)
    assert(b.take(2) === Seq(0xac, 0x02))
    assert(b.length === 302)
    // multi-byte UTF-8 counts BYTES, not chars: é = C3 A9
    assert(bytes(RowBinary.StringCodec, "é") === Seq(0x02, 0xc3, 0xa9))
  }

  test("golden bytes: Nullable presence byte and DateTime64(6) micros") {
    val nstr = RowBinary.NullableCodec(RowBinary.StringCodec)
    assert(bytes(nstr, null) === Seq(0x01))
    assert(bytes(nstr, "x") === Seq(0x00, 0x01, 0x78))
    // 1970-01-01 00:00:01.000002 UTC = 1000002 micros = 0x0F4244
    val t = new java.sql.Timestamp(1000L)
    t.setNanos(2000)
    assert(bytes(RowBinary.DateTime64MicrosCodec, t) ===
      Seq(0x42, 0x42, 0x0f, 0, 0, 0, 0, 0))
  }

  test("codecFor resolves DDL types and fails fast on uncovered ones") {
    assert(RowBinary.codecFor("Nullable(DateTime64(6))") ===
      RowBinary.NullableCodec(RowBinary.DateTime64MicrosCodec))
    val e = intercept[IllegalArgumentException] {
      RowBinary.codecFor("Decimal256(0)")
    }
    assert(e.getMessage.contains("Decimal256"))
  }

  test("wire round trip: create + partition-parallel insert + sharded readback") {
    val stub = ClickHouseHttpStub.start()
    try {
      val slice = graft.sources.Tables(spark, dir).events
        .where(col("event_id") < 500L)
        .repartition(4)
      val table = ClickHouseDdl.ChTable("events_rt",
        orderBy = Seq("event_id"), unsigned = Set("event_id", "user_id"))
      ClickHouseHttpSink.command(stub.url,
        ClickHouseDdl.createTable(table, slice.schema))
      val chTypes = ClickHouseDdl.columnTypes(table, slice.schema)
      ClickHouseHttpSink.insert(slice, stub.url, "events_rt", chTypes)
      // each non-empty partition posted independently
      assert(stub.insertRequests === 4)
      assert(stub.rowCount("events_rt") === 500)
      val back = ClickHouseHttpSink.readRanges(spark, stub.url, "events_rt",
        chTypes, slice.schema, "event_id", 0L, 500L, nShards = 5)
      assert(back.rdd.getNumPartitions === 5)
      val a = back.collect().sortBy(_.getLong(0))
      val b = slice.collect().sortBy(_.getLong(0))
      assert(a.length === b.length)
      a.zip(b).foreach { case (x, y) => assert(x === y) }
    } finally stub.stop()
  }

  test("insert into a table the stub never saw a CREATE for fails loudly") {
    val stub = ClickHouseHttpStub.start()
    try {
      val df = spark.range(3).selectExpr("id AS event_id")
      val e = intercept[Exception] {
        ClickHouseHttpSink.insert(df, stub.url, "nope",
          Seq("event_id" -> "Int64"))
      }
      assert(e.getMessage.contains("404") || e.getMessage.contains("nope"))
    } finally stub.stop()
  }

  test("CREATE with a type outside the wire layer is rejected at DDL time") {
    val stub = ClickHouseHttpStub.start()
    try {
      val e = intercept[Exception] {
        ClickHouseHttpSink.command(stub.url,
          "CREATE TABLE IF NOT EXISTS t (\n    amount Decimal256(0)\n) " +
            "ENGINE = MergeTree\nORDER BY amount;")
      }
      assert(e.getMessage.contains("Decimal256"))
    } finally stub.stop()
  }

  test("k27 gated query matches the direct-parquet aggregation") {
    val viaWire = ClickHouseHttpQuery
      .k27ClickhouseWireInsert(spark, dir).collect()
    val direct = graft.sources.Tables(spark, dir).events
      .where(col("event_id") < 30000L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(38,6)")).cast("double")
          .as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("ts")).as("max_ts"),
        count(when(pmod(col("event_id"), lit(97)) === 0, lit(null))
          .otherwise(col("props"))).as("n_props"))
      .orderBy(col("event_type"))
      .collect()
    assert(viaWire.length === 5) // all five event types
    assert(viaWire.toSeq === direct.toSeq)
    // the planted nulls actually crossed the wire as nulls
    val totalRows = viaWire.map(_.getLong(1)).sum
    val totalProps = viaWire.map(_.getLong(5)).sum
    assert(totalProps < totalRows,
      "no null props survived — the Nullable path went untested")
  }
}
