package graft

import java.io.{DataInputStream, ByteArrayInputStream}
import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.RowBinary


/** Recorded-fixture replay of the two integration protocols (round 11):
  * the sandbox has no egress, so the env-gated mains
  * (integration/RealPortalIngest, RealClickHouseRoundtrip) can't reach
  * a live portal or ClickHouse — but the BYTE level is pinned here
  * against payloads produced by INDEPENDENT implementations
  * (tools/make_fixtures.py: pyarrow IPC for the portal pages, a
  * from-the-spec Python packer for RowBinary), committed under
  * src/test/resources/fixtures. The loopback stubs elsewhere generate
  * their wire bytes with the same Arrow-Java / codec classes the
  * client uses — these fixtures are the cross-implementation check
  * those stubs structurally cannot be.
  *
  * Deterministic row rules are make_fixtures.py's, restated here —
  * 48 rows: event_id=i; ts = 1700000000000000 + i*1e6 µs; user_id null
  * when i%7==3 else 1000+(i*37)%97; event_type = 5-cycle; value =
  * i*1.5+0.25; props null when i%13==6 else {"k":i}.
  */
class FixtureReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private val fixtureDir = "src/test/resources/fixtures"
  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(fixtureDir, name))

  private val types = Seq("view", "click", "purchase", "signup", "error")
  private def expUser(i: Int): Any =
    if (i % 7 == 3) null else 1000L + (i * 37) % 97
  private def expProps(i: Int): Any =
    if (i % 13 == 6) null else s"""{"k":$i}"""

  test("portal fixture: the arrow-http source ingests pyarrow-written " +
    "pages end to end (paging cursor, multi-batch stream, nulls)") {
    val pages = (0 to 2).map(p => fixture(s"portal_page_$p.arrows"))
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.setExecutor(Executors.newFixedThreadPool(4, (r: Runnable) => {
      val t = new Thread(r, "fixture-portal"); t.setDaemon(true); t
    }))
    server.createContext("/metadata", (ex: HttpExchange) => {
      val body = """{"start_block":0,"height":48}"""
        .getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    })
    server.createContext("/query", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val from = """"from_block"\s*:\s*(\d+)""".r
        .findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(0L)
      val page = (from / 16).toInt.min(2)
      val next = ((page + 1) * 16).min(48)
      ex.getResponseHeaders.set("X-Next-Block", next.toString)
      ex.sendResponseHeaders(200, pages(page).length.toLong)
      ex.getResponseBody.write(pages(page)); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val got = spark.read.format("arrow-http")
        .option("url", url)
        .load()
        .orderBy("event_id")
        .collect()
      assert(got.length === 48)
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) === i.toLong, s"event_id at $i")
        val micros = {
          val t = r.getTimestamp(1)
          math.floorDiv(t.getTime, 1000L) * 1000000L +
            (t.getNanos / 1000L) % 1000000L
        }
        assert(micros === 1700000000000000L + i * 1000000L, s"ts at $i")
        assert((if (r.isNullAt(2)) null else r.getLong(2)) === expUser(i),
          s"user_id at $i")
        assert(r.getString(3) === types(i % 5), s"event_type at $i")
        assert(r.getDouble(4) === i * 1.5 + 0.25, s"value at $i")
        assert((if (r.isNullAt(5)) null else r.getString(5)) === expProps(i),
          s"props at $i")
      }
    } finally server.stop(0)
  }

  test("rowbinary fixture: the sink codec decodes the from-the-spec " +
    "packer's bytes and re-encodes them byte-identically") {
    val bytes = fixture("clickhouse_rows.rowbinary")
    val codecs = Seq("UInt64", "DateTime64(6)", "Nullable(Int64)",
      "String", "Float64", "Nullable(String)").map(RowBinary.codecFor)
    val rows = RowBinary.decode(bytes, codecs)
    assert(rows.length === 48)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r(0) === i.toLong, s"event_id at $i")
      val t = r(1).asInstanceOf[java.sql.Timestamp]
      val micros = math.floorDiv(t.getTime, 1000L) * 1000000L +
        (t.getNanos / 1000L) % 1000000L
      assert(micros === 1700000000000000L + i * 1000000L, s"ts at $i")
      assert(r(2) === expUser(i), s"user_id at $i")
      assert(r(3) === types(i % 5), s"event_type at $i")
      assert(r(4) === (i * 1.5 + 0.25), s"value at $i")
      assert(r(5) === expProps(i), s"props at $i")
    }
    // the round trip: our encoder must land on the independent
    // implementation's exact bytes (LEB128 lengths, LE ints, null
    // flags, DateTime64(6) micros)
    val reEncoded = RowBinary.encode(rows.iterator.map(_.toSeq), codecs)
    assert(java.util.Arrays.equals(reEncoded, bytes),
      "re-encoded RowBinary differs from the independent packer's bytes")
    // and a sanity guard that the decode really consumed everything
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    in.skip(bytes.length.toLong)
    assert(in.read() === -1)
  }
}
