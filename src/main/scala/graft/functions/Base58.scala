package graft.functions

import java.math.BigInteger

/** Base58 (Bitcoin/Solana alphabet) encode/decode — reference: cherry-core
  * `base58_decode_string` used for Solana account keys at
  * /root/reference/src/cherry_pipelines/svm/orca_swaps.py:235-260.
  * Static methods so codegen'd Java calls straight in.
  */
object Base58 {
  private val Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val Fifty8 = BigInteger.valueOf(58)
  private val Indexes: Array[Int] = {
    val a = Array.fill(128)(-1)
    var i = 0
    while (i < Alphabet.length) { a(Alphabet.charAt(i)) = i; i += 1 }
    a
  }

  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    val sb = new java.lang.StringBuilder
    var bi = new BigInteger(1, input)
    while (bi.signum() > 0) {
      val qr = bi.divideAndRemainder(Fifty8)
      sb.append(Alphabet.charAt(qr(1).intValue()))
      bi = qr(0)
    }
    var i = 0
    while (i < zeros) { sb.append('1'); i += 1 }
    sb.reverse().toString
  }

  /** Returns null for a string containing non-alphabet characters (the
    * expression layer surfaces that as a SQL NULL, mirroring the
    * reference's lossy decode of malformed keys).
    */
  def decode(s: String): Array[Byte] = {
    if (s == null) return null
    if (s.isEmpty) return Array.emptyByteArray
    var zeros = 0
    while (zeros < s.length && s.charAt(zeros) == '1') zeros += 1
    var bi = BigInteger.ZERO
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val d = if (c < 128) Indexes(c) else -1
      if (d < 0) return null
      bi = bi.multiply(Fifty8).add(BigInteger.valueOf(d.toLong))
      i += 1
    }
    val raw = bi.toByteArray
    val stripped =
      if (raw.length > 1 && raw(0) == 0) java.util.Arrays.copyOfRange(raw, 1, raw.length)
      else raw
    val payload = if (bi.signum() == 0) Array.emptyByteArray else stripped
    val out = new Array[Byte](zeros + payload.length)
    System.arraycopy(payload, 0, out, zeros, payload.length)
    out
  }
}
