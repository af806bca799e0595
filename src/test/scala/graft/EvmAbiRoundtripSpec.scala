package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EvmAbi

/** Property-style roundtrip for the dynamic-type ABI decoder: an
  * INDEPENDENT test-side encoder (plain Scala, head/tail per the spec)
  * encodes randomized (string, uint32[]) payloads — including empty,
  * word-aligned, and multibyte-UTF-8 edges — and EvmAbi.decodeEvent must
  * recover every value exactly. A seeded RNG keeps the 300 cases
  * deterministic; one DataFrame, one decode pass.
  */
class EvmAbiRoundtripSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private def word(v: BigInt): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    require(raw.length <= 32)
    Array.fill[Byte](32 - raw.length)(0) ++ raw
  }
  private def padRight(b: Array[Byte]): Array[Byte] =
    b ++ Array.fill[Byte]((32 - b.length % 32) % 32)(0)

  /** Spec-conformant encoder for E(string note, uint32[] vals). */
  private def encode(note: Array[Byte], vals: Seq[Long]): Array[Byte] = {
    val noteTail = word(BigInt(note.length)) ++ padRight(note)
    val head = word(BigInt(64)) ++ word(BigInt(64 + noteTail.length))
    head ++ noteTail ++ word(BigInt(vals.length)) ++
      vals.flatMap(v => word(BigInt(v))).toArray
  }

  test("300 randomized (string, uint32[]) payloads decode exactly") {
    import spark.implicits._
    val sig = "E(string note, uint32[] vals)"
    val rnd = new scala.util.Random(0xABCDEF)
    def randString(n: Int): String =
      // mix ASCII with BMP multibyte so byte length ≠ char length
      (0 until n).map { _ =>
        if (rnd.nextInt(4) == 0) (0x00C0 + rnd.nextInt(0x100)).toChar
        else (0x20 + rnd.nextInt(0x5f)).toChar
      }.mkString
    val cases = (0 until 300).map { i =>
      val note =
        if (i == 0) "" // empty string
        else if (i == 1) "x" * 32 // exactly one word, zero padding
        else randString(rnd.nextInt(80))
      val vals: Seq[Long] =
        if (i == 0) Seq.empty // empty array
        else Seq.fill(rnd.nextInt(7))(rnd.nextLong() & 0xFFFFFFFFL)
      (i.toLong, note, vals)
    }
    val rows = cases.map { case (i, note, vals) =>
      (i, encode(note.getBytes("UTF-8"), vals), note, vals)
    }
    val df = rows.toDF("id", "data", "want_note", "want_vals")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    val out = EvmAbi.decodeEvent(df, sig)
      .select("id", "note", "vals", "want_note", "want_vals").collect()
    assert(out.length === 300)
    out.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"case ${r.getLong(0)} nulled")
      assert(r.getString(1) === r.getString(3), s"case ${r.getLong(0)} note")
      assert(r.getSeq[Long](2) === r.getSeq[Long](4),
        s"case ${r.getLong(0)} vals")
    }
  }

  test("every single-byte corruption of the length words decode-fails") {
    import spark.implicits._
    val sig = "E(string note, uint32[] vals)"
    val good = encode("hello world".getBytes("UTF-8"), Seq(1L, 2L, 3L))
    // corrupt each byte of the two offset words to values that break
    // alignment/bounds (0x01 in any position makes a non-32-multiple or
    // out-of-range offset)
    val corrupted = (0 until 64).map { pos =>
      val b = good.clone(); b(pos) = 0x01.toByte; (pos.toLong, b)
    }
    val df = corrupted.toDF("id", "data")
      .withColumn("topic0", unhex(lit(EvmAbi.signatureTopic0Hex(sig))))
    val out = EvmAbi.decodeEvent(df, sig).select("id", "note", "vals")
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2),
        s"corrupt offset byte ${r.getLong(0)} survived decode")
    }
  }
}
