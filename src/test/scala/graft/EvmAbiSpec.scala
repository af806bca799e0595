package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.EvmAbi
import graft.functions.EvmAbi._

/** The generalized event-ABI decoder: signature parsing, canonicalization,
  * topic0 derivation (public keccak vectors), word decoding for each
  * supported type, and the allow_decode_fail null semantics — including
  * the ERC-721-Transfer-shares-ERC-20-topic0 hazard the reference's
  * allow_decode_fail flag exists for (erc20_transfers.py:131-141).
  */
class EvmAbiSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def u256(v: Long): Array[Byte] = {
    val b = new Array[Byte](32)
    var x = v; var i = 31
    while (x != 0) { b(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    b
  }
  private val transferHex =
    "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

  test("parse full signature: names, indexed markers, canonical form") {
    val sig = parseEvent(
      "Transfer(address indexed from, address indexed to, uint256 amount)")
    assert(sig.event === "Transfer")
    assert(sig.canonical === "Transfer(address,address,uint256)")
    assert(sig.params.map(_.name) === Seq("from", "to", "amount"))
    assert(sig.params.map(_.indexed) === Seq(true, true, false))
    assert(sig.topic0Hex === transferHex) // public ERC-20 vector
  }

  test("parse canonical signature: auto names, uint alias, width checks") {
    val sig = parseEvent("E(address,uint,bool,bytes32,uint64)")
    assert(sig.canonical === "E(address,uint256,bool,bytes32,uint64)")
    assert(sig.params.map(_.name) === Seq("p0", "p1", "p2", "p3", "p4"))
    intercept[IllegalArgumentException](parseEvent("E(uint7)"))
    intercept[IllegalArgumentException](parseEvent("E(bytes33)"))
    intercept[IllegalArgumentException](parseEvent("E(int7)"))
    assert(parseEvent("E(int,int128)").canonical === "E(int256,int128)")
    // non-indexed dynamics are tail-decodable; arrays normalize element
    // aliases in the canonical form
    assert(parseEvent("E(string data_, uint[] vals)").canonical ===
      "E(string,uint256[])")
    intercept[IllegalArgumentException](
      parseEvent("E(uint256 indexed a, uint256 indexed b, " +
        "uint256 indexed c, uint256 indexed d)")) // >3 indexed
    // tuples, nested dynamics and malformed widths must fail as
    // 'unsupported ABI type', not leak a NumberFormatException
    for (bad <- Seq("E(bytes[] b)", "E(string[] s)", "E(uint256[][] m)",
        "E((uint256,address) t)", "E(uintX n)", "E(bytesX n)", "E(intX n)")) {
      val e = intercept[IllegalArgumentException](parseEvent(bad))
      assert(e.getMessage.contains("unsupported ABI type"), bad)
    }
  }

  test("dynamic tail decode: string, bytes, uint256[] — well-formed rows") {
    // LogCall(address indexed usr, string note, uint256[] vals)
    val sig = "LogCall(address indexed usr, string note, uint256[] vals)"
    def pad32(b: Array[Byte]): Array[Byte] =
      b ++ Array.fill[Byte]((32 - b.length % 32) % 32)(0)
    val note = "hello tail".getBytes("UTF-8")
    // head: [off(note)=64, off(vals)=128] ++ tail(note) ++ tail(vals)
    val data = u256(64) ++ u256(64 + 32 + 32) ++
      (u256(note.length) ++ pad32(note)) ++
      (u256(3) ++ u256(7) ++ u256(8) ++ u256(9))
    val df = Seq((u256(0xbeefL), data)).toDF("topic1", "data")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    val r = EvmAbi.decodeEvent(df, sig).select("usr", "note", "vals").head
    assert(r.getString(0).endsWith("beef"))
    assert(r.getString(1) === "hello tail")
    assert(r.getSeq[java.math.BigDecimal](2).map(_.longValueExact) ===
      Seq(7L, 8L, 9L))

    // empty string + empty array: tails are just length words
    val empty = u256(64) ++ u256(96) ++ u256(0) ++ u256(0)
    val df2 = df.withColumn("data", lit(empty))
    val r2 = EvmAbi.decodeEvent(df2, sig).select("note", "vals").head
    assert(r2.getString(0) === "")
    assert(r2.getSeq[java.math.BigDecimal](1).isEmpty)
  }

  test("totality fuzz: random and truncated blobs decode to nulls, never" +
    " throw") {
    // allow_decode_fail is only a real guarantee if NO payload can crash
    // the job: 300 seeded-random data blobs (arbitrary lengths, arbitrary
    // bytes — garbage offsets/lengths/padding included) through a dynamic
    // signature must yield rows (with null fields where invalid), not
    // exceptions. This is the 100 TB property: one malformed log among
    // billions must not kill the stage.
    val sig = "LogCall(address indexed usr, string note, uint256[] vals)"
    val rng = new scala.util.Random(20260813L)
    val blobs = (0 until 300).map { i =>
      val len = rng.nextInt(200)
      val b = new Array[Byte](len)
      rng.nextBytes(b)
      (i.toLong, u256(rng.nextLong() & 0x7fffffffL), b)
    }
    val df = blobs.toDF("row_id", "topic1", "data")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    val out = EvmAbi.decodeEvent(df, sig)
      .select("row_id", "note", "vals").collect() // must not throw
    assert(out.length === 300)
    // and the decode is total the other way too: every all-zero blob of
    // any word-aligned length decodes without throwing
    val zeros = (0 to 6).map(w => (w.toLong, u256(1), new Array[Byte](w * 32)))
    val zdf = zeros.toDF("row_id", "topic1", "data")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    assert(EvmAbi.decodeEvent(zdf, sig).collect().length === zeros.size)
  }

  test("dynamic tail decode-fail: bad offsets, lengths, padding all null") {
    val sig = "LogCall(string note, uint64[] vals)"
    val good = u256(64) ++ u256(128) ++
      (u256(2) ++ ("hi".getBytes("UTF-8") ++ Array.fill[Byte](30)(0))) ++
      (u256(1) ++ u256(5))
    val rows = Seq(
      ("good", good),
      // offset not 32-aligned
      ("unaligned", u256(65) ++ good.drop(32)),
      // offset points before the head's end
      ("into_head", u256(32) ++ good.drop(32)),
      // length word claims more than the blob holds
      ("overlong", u256(64) ++ u256(128) ++
        (u256(99) ++ ("hi".getBytes("UTF-8") ++ Array.fill[Byte](30)(0))) ++
        (u256(1) ++ u256(5))),
      // nonzero bytes in the string's padding
      ("dirty_pad", u256(64) ++ u256(128) ++
        (u256(2) ++ ("hi".getBytes("UTF-8") ++ Array.fill[Byte](30)(1))) ++
        (u256(1) ++ u256(5))),
      // array element violates uint64 padding (high bytes set)
      ("fat_elem", u256(64) ++ u256(128) ++
        (u256(2) ++ ("hi".getBytes("UTF-8") ++ Array.fill[Byte](30)(0))) ++
        (u256(1) ++ Array.fill[Byte](32)(0x7f))),
      // blob not word-aligned
      ("ragged", good ++ Array[Byte](1)),
      // TRUNCATED ARRAY: length word claims 2 elements, blob holds 1 —
      // an array tail is 32·n bytes, NOT the string padding formula
      // ceil(n/32)·32, which would accept this and fabricate a 0 element
      ("short_array", u256(64) ++ u256(128) ++
        (u256(2) ++ ("hi".getBytes("UTF-8") ++ Array.fill[Byte](30)(0))) ++
        (u256(2) ++ u256(5))))
    val df = rows.toDF("label", "data")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    val out = EvmAbi.decodeEvent(df, sig)
      .select("label", "note", "vals").collect()
      .map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out("good") === ((false, false)))
    for (bad <- Seq("unaligned", "into_head", "overlong", "dirty_pad",
        "fat_elem", "ragged", "short_array"))
      assert(out(bad) === ((true, true)), bad)
  }

  test("truncated uint256[] nulls: the tail bound is 32·n, not padded-n") {
    // uint256 elements have NO per-word padding check (wordOk = true), so
    // ONLY the 32·n tail bound rejects a truncated array — with the
    // string-padding formula ceil(n/32)·32 this blob (n=2, one element
    // present) passed and fabricated a zero element
    val sig = "LogCall(uint256[] vals)"
    val truncated = u256(32) ++ u256(2) ++ u256(7) // claims 2, holds 1
    val whole = u256(32) ++ u256(2) ++ u256(7) ++ u256(9)
    val df = Seq(("truncated", truncated), ("whole", whole))
      .toDF("label", "data")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    val out = EvmAbi.decodeEvent(df, sig).select("label", "vals").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(out("truncated") === true, "truncated array must decode-fail")
    assert(out("whole") === false)
  }

  test("dynamic decode on the trusted path never throws on garbage") {
    val sig = "LogCall(string note, uint256[] vals)"
    val rows = Seq(
      Array.fill[Byte](64)(0x7e), // offsets pointing far out of the blob
      u256(64) ++ u256(96) ++ u256(Long.MaxValue) ++ u256(0), // huge length
      Array[Byte](1, 2, 3)) // shorter than the head
      .map(Tuple1(_))
    val df = rows.toDF("data")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    // must evaluate without throwing; values are garbage/null by contract
    EvmAbi.decodeEvent(df, sig, allowDecodeFail = false)
      .select("note", "vals").collect()
  }

  test("decodeEvent rejects param names colliding with input columns") {
    val df = Seq((u256(1L), u256(2L)))
      .toDF("topic1", "data")
      .withColumn("topic0", unhex(lit(
        EvmAbi.signatureTopic0Hex("E(uint256 indexed data, uint256 n)"))))
    val e = intercept[IllegalArgumentException](
      EvmAbi.decodeEvent(df, "E(uint256 indexed data, uint256 n)"))
    assert(e.getMessage.contains("collide"))
  }

  test("decode a well-formed Transfer log: all three columns") {
    val df = Seq((1L, u256(0xabcdefL), u256(0x1234L), u256(99999L)))
      .toDF("id", "topic1", "topic2", "data")
      .withColumn("topic0", unhex(lit(transferHex)))
    val out = EvmAbi.decodeEvent(df,
      "Transfer(address indexed from, address indexed to, uint256 amount)")
      .select("from", "to", "amount").head
    assert(out.getString(0) === "0" * 34 + "abcdef")
    assert(out.getString(1) === "0" * 36 + "1234")
    assert(out.getDecimal(2).longValueExact === 99999L)
  }

  test("typed decode: bool, bytes32, uint32 as long, indexed dynamic") {
    // uint64's max exceeds Long so it stays Decimal; uint32 narrows to long
    val sig = "E(bool indexed flag, uint32 n, bytes32 h, string indexed s)"
    val hash = Array.fill[Byte](32)(0x11)
    val df = Seq((u256(1L), hash, u256(42L) ++ u256(7L)))
      .toDF("topic1", "topic2", "data")
      .withColumn("topic0",
        unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    val r = EvmAbi.decodeEvent(df, sig).select("flag", "n", "h", "s").head
    assert(r.getBoolean(0) === true)
    assert(r.getLong(1) === 42L)
    assert(r.getAs[Array[Byte]](2).toSeq === u256(7L).toSeq)
    assert(r.getString(3) === "11" * 32)
  }

  test("allow_decode_fail: malformed rows yield all-null decode") {
    val good = Row(1L, unhexStr(transferHex), u256(1L), u256(2L), null,
      u256(10L))
    val wrongTopic0 = Row(2L, u256(0xdeadL), u256(1L), u256(2L), null,
      u256(10L))
    val shortData = Row(3L, unhexStr(transferHex), u256(1L), u256(2L), null,
      Array[Byte](1, 2, 3))
    val emptyData = Row(4L, unhexStr(transferHex), u256(1L), u256(2L), null,
      Array.emptyByteArray)
    // ERC-721 shape: same topic0, tokenId indexed → topic3 set, data empty
    val erc721 = Row(5L, unhexStr(transferHex), u256(1L), u256(2L),
      u256(777L), Array.emptyByteArray)
    val missingTopic = Row(6L, unhexStr(transferHex), u256(1L), null, null,
      u256(10L))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("topic0",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("topic1",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("topic2",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("topic3",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("data",
        org.apache.spark.sql.types.BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(good, wrongTopic0, shortData, emptyData,
        erc721, missingTopic), schema)
    val out = EvmAbi.decodeEvent(df,
      "Transfer(address indexed from, address indexed to, uint256 amount)")
      .select("id", "from", "to", "amount").orderBy("id").collect()
    assert(out.length === 6)
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2) && !out(0).isNullAt(3))
    out.drop(1).foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
        s"row ${r.getLong(0)} should be all-null")
    }
  }

  test("padding violations decode-fail: truncation is never silent") {
    // uint8 word with a nonzero high byte / bool word > 1: the reference
    // decoder rejects these rows (different event, same topic0), it does
    // not truncate
    val sig = "E(uint8 indexed small, bool indexed flag)"
    val t0 = unhex(lit(EvmAbi.signatureTopic0Hex(sig)))
    val good = u256(200L)
    val dirty = { val b = u256(200L); b(0) = 1; b } // high byte set
    val bool2 = u256(2L)                            // not 0/1
    val df = Seq(
      (1L, good, u256(1L)),
      (2L, dirty, u256(1L)),
      (3L, good, bool2))
      .toDF("id", "topic1", "topic2").withColumn("topic0", t0)
    val out = EvmAbi.decodeEvent(df, sig)
      .select("id", "small", "flag").orderBy("id").collect()
    assert(out(0).getLong(1) === 200L && out(0).getBoolean(2) === true)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2), "dirty uint8 row")
    assert(out(2).isNullAt(1) && out(2).isNullAt(2), "bool=2 row")
  }

  test("signed intN decode: negatives, sign-extension validity") {
    // Uniswap-V3 Swap shape: int256 amounts, one positive one negative
    val sig = "S(address indexed sender, int256 amount0, int8 delta)"
    val t0 = unhex(lit(EvmAbi.signatureTopic0Hex(sig)))
    val neg5 = Array.fill[Byte](32)(0xff.toByte); neg5(31) = 0xfb.toByte
    val minus1Byte = Array.fill[Byte](32)(0xff.toByte) // int8 -1, extended
    val badExt = { val b = new Array[Byte](32); b(31) = 0x80.toByte; b }
    // int8 value byte 0x80 (-128) needs 0xff lead bytes; zeros = invalid
    val rows = Seq(
      (1L, u256(7L), u256(5L) ++ minus1Byte),
      (2L, u256(7L), neg5 ++ minus1Byte),
      (3L, u256(7L), u256(5L) ++ badExt))
      .toDF("id", "topic1", "data").withColumn("topic0", t0)
    val out = EvmAbi.decodeEvent(rows, sig)
      .select("id", "amount0", "delta").orderBy("id").collect()
    assert(out(0).getDecimal(1).longValueExact === 5L)
    assert(out(0).getLong(2) === -1L)
    assert(out(1).getDecimal(1).longValueExact === -5L)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2),
      "bad sign extension must fail the row")
  }

  test("decodeFunction: static + dynamic calldata, selector/shape guards") {
    val sig = "submit(address src, string note, uint256[] vals)"
    assert(EvmAbi.selectorHex(sig) ===
      EvmAbi.signatureTopic0Hex("submit(address,string,uint256[])").take(8))
    val sel = unhexStr(EvmAbi.selectorHex(sig))
    // args section (offsets ABI-relative to ITS start, not the calldata):
    // head = [address word, off(note)=96, off(vals)=160],
    // note tail = len 5 + "hello" padded, vals tail = len 2 + two words
    val note = "hello".getBytes("UTF-8")
    val good = sel ++ u256(42L) ++ u256(96L) ++ u256(160L) ++
      u256(note.length.toLong) ++ note ++ new Array[Byte](27) ++
      u256(2L) ++ u256(7L) ++ u256(9L)
    val truncated = good.dropRight(32) // vals promises 2 words, has 1
    val foreign = unhexStr("deadbeef") ++ good.drop(4)
    val df = Seq((1L, good), (2L, truncated), (3L, foreign))
      .toDF("id", "input")
    val out = EvmAbi.decodeFunction(df, sig)
      .select("id", "src", "note", "vals").orderBy("id").collect()
    assert(out(0).getString(1) === f"${42L}%040x")
    assert(out(0).getString(2) === "hello")
    assert(out(0).getSeq[java.math.BigDecimal](3).map(_.longValueExact)
      === Seq(7L, 9L))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3),
      "truncated tail must null the whole decode")
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) && out(2).isNullAt(3),
      "foreign selector must null the whole decode")
    intercept[IllegalArgumentException](
      EvmAbi.selectorHex("f(uint256 indexed x)"))
  }

  test("decode is a pure projection — no shuffle, no UDF in the plan") {
    val df = Seq((u256(1L), u256(2L), u256(3L)))
      .toDF("topic1", "topic2", "data")
      .withColumn("topic0", unhex(lit(transferHex)))
    val plan = EvmAbi.decodeEvent(df,
      "Transfer(address indexed from, address indexed to, uint256 amount)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  private def unhexStr(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
}
