package graft.functions

/** Keccak-256 (original Keccak padding 0x01, as used for EVM event-signature
  * topic0 hashes — reference: cherry-core `evm_signature_to_topic0`, used at
  * /root/reference/src/cherry_pipelines/evm/erc20_transfers.py:94).
  *
  * Pure-JVM implementation of Keccak-f[1600] from the public FIPS-202 /
  * Keccak reference specification. Static methods so generated (codegen)
  * Java can call straight into it.
  */
object Keccak {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)
  private val ROTC: Array[Int] =
    Array(1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
      27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44)
  private val PILN: Array[Int] =
    Array(10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
      15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1)

  @inline private def rotl(x: Long, n: Int): Long = (x << n) | (x >>> (64 - n))

  private def keccakF(st: Array[Long]): Unit = {
    val bc = new Array[Long](5)
    var round = 0
    while (round < 24) {
      var i = 0
      while (i < 5) {
        bc(i) = st(i) ^ st(i + 5) ^ st(i + 10) ^ st(i + 15) ^ st(i + 20)
        i += 1
      }
      i = 0
      while (i < 5) {
        val t = bc((i + 4) % 5) ^ rotl(bc((i + 1) % 5), 1)
        var j = 0
        while (j < 25) { st(j + i) ^= t; j += 5 }
        i += 1
      }
      var t = st(1)
      i = 0
      while (i < 24) {
        val j = PILN(i)
        val tmp = st(j)
        st(j) = rotl(t, ROTC(i))
        t = tmp
        i += 1
      }
      var j = 0
      while (j < 25) {
        i = 0
        while (i < 5) { bc(i) = st(j + i); i += 1 }
        i = 0
        while (i < 5) {
          st(j + i) ^= (~bc((i + 1) % 5)) & bc((i + 2) % 5)
          i += 1
        }
        j += 5
      }
      st(0) ^= RC(round)
      round += 1
    }
  }

  @inline private def leLong(a: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (a(off + i) & 0xffL); i -= 1 }
    v
  }

  /** keccak256(input) → 32 bytes (Ethereum/pre-NIST padding 0x01). */
  def hash256(input: Array[Byte]): Array[Byte] = sponge256(input, 0x01)

  /** SHA3-256 (NIST padding 0x06) — same sponge, used to cross-check the
    * multi-block absorb path against hashlib's SHA3 test vectors. */
  def sha3_256(input: Array[Byte]): Array[Byte] = sponge256(input, 0x06)

  private def sponge256(input: Array[Byte], pad: Byte): Array[Byte] = {
    val rate = 136
    val st = new Array[Long](25)
    var off = 0
    while (input.length - off >= rate) {
      var i = 0
      while (i < rate / 8) { st(i) ^= leLong(input, off + i * 8); i += 1 }
      keccakF(st)
      off += rate
    }
    val block = new Array[Byte](rate)
    System.arraycopy(input, off, block, 0, input.length - off)
    block(input.length - off) = pad
    block(rate - 1) = (block(rate - 1) | 0x80).toByte
    var i = 0
    while (i < rate / 8) { st(i) ^= leLong(block, i * 8); i += 1 }
    keccakF(st)
    val out = new Array[Byte](32)
    i = 0
    while (i < 4) {
      val v = st(i)
      var b = 0
      while (b < 8) { out(i * 8 + b) = ((v >>> (8 * b)) & 0xff).toByte; b += 1 }
      i += 1
    }
    out
  }
}
