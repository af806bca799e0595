package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared LSH band geometry — the ONE place banding constants live.
  *
  * Three geometry families, each with a different contract:
  *
  *  - [[scaled]]: bit-sliced signature bands whose bucket width GROWS
  *    with the corpus so per-bucket occupancy stays ~bounded. A fixed
  *    width is a hidden n²/2^bits quadratic: the round-5 sf10 rehearsal
  *    measured the fixed-16-bucket variant as a 300 s cliff at 20k
  *    vectors. Used by d06 (embedding near-dup) and s02 (ANN), whose
  *    candidate joins must stay linear in n.
  *  - [[pigeonhole]]: equal bit-slices sized so hamming ≤ h implies at
  *    least one identical band (h+1 bands over the signature) — the d03
  *    SimHash guarantee. This geometry is CORRECTNESS-pinned: scaling it
  *    would break the no-missed-candidate property, so it never scales.
  *  - [[MinhashBands]]/[[MinhashRows]]: minhash (b, r) banding, where
  *    the knob is not bucket width (buckets are 64-bit hashes of r-hash
  *    slices — already collision-free) but the jaccard threshold
  *    s* ≈ (1/b)^(1/r) at which collision probability crosses ½. Fixed
  *    at (4, 4) → s* ≈ 0.707, matched to the d02 verify τ = 0.6.
  */
object Lsh {

  /** bands × bits split of a ≤64-bit signature. */
  final case class BandGeometry(bands: Int, bits: Int) {
    require(bands >= 1 && bits >= 1 && bands * bits <= 64,
      s"band geometry $bands×$bits exceeds the 64-bit signature envelope")
    /** total hyperplanes / signature bits consumed */
    def planes: Int = bands * bits
    def mask: Long = (1L << bits) - 1
    /** per-band bucket values of `sig`, ready for posexplode into
      * (band, bucket) candidate-join rows. */
    def bucketArray(sig: Column): Column =
      array((0 until bands).map(b =>
        shiftright(sig, b * bits).bitwiseAND(lit(mask))): _*)
  }

  /** Corpus-scaled geometry (the round-5 d06 fix, generalized): width
    * targets ~perBucket items per bucket — first widen bits, then, once
    * the 64-plane signature caps bands×bits, trade bands for width.
    * Recall for borderline-τ pairs decays as bands widen/shrink (the
    * standard (b, r) trade); exact/near-exact dups — the bulk at crawl
    * scale — collide at any geometry. `n` should be the DISTINCT item
    * count when an exact-dup pre-collapse runs first. */
  def scaled(n: Long, perBucket: Long = 64L, minBits: Int = 4,
      maxBits: Int = 16, maxBands: Int = 8, minBands: Int = 2): BandGeometry = {
    val bits = math.min(maxBits, math.max(minBits,
      64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, n / perBucket - 1)))).toInt
    val bands = math.max(minBands, math.min(maxBands, 64 / bits))
    BandGeometry(bands, bits)
  }

  /** Pigeonhole split: maxHamming+1 equal slices of a sigBits signature,
    * so two signatures within hamming ≤ maxHamming MUST agree on at
    * least one whole band — no candidate is ever missed. */
  def pigeonhole(sigBits: Int, maxHamming: Int): BandGeometry = {
    val bands = maxHamming + 1
    require(sigBits % bands == 0,
      s"$sigBits-bit signature does not split into $bands equal bands")
    BandGeometry(bands, sigBits / bands)
  }

  /** Minhash banding constants (d02/d12): b bands of r minhash rows.
    * Collision probability of a jaccard-s pair is 1-(1-s^r)^b, crossing
    * ½ at s* = (1/b)^(1/r) — (4, 4) puts s* ≈ 0.707 just above the 0.6
    * verify τ, the standard near-dup operating point. */
  val MinhashBands = 4
  val MinhashRows = 4

  /** The (b, r) collision threshold s* — where a pair's band-collision
    * probability crosses ½. Exposed for the spec pinning the constants
    * to their τ. */
  def minhashThreshold(bands: Int, rows: Int): Double =
    math.pow(1.0 / bands, 1.0 / rows)

  /** The PORTABLE minhash family (round 9 — what promoted d02/d12 to
    * full DuckDB oracles): one md5 per shingle yields four independent
    * 28-bit chunks x1..x4, and member i of the family is the random
    * signed-free linear mix
    *   h_i = Σ_k c_{i,k} · (x_k ⊕ r_{i,k})
    * with 31-bit odd multipliers c and 28-bit XOR scramblers r derived
    * from the same splitmix64 the production kernels use, embedded as
    * literals in the generated oracle so they cannot drift. One digest
    * traversal yields all 16 values (the economy the old one-pass
    * xxhash64 kernel had) in plain BIGINT arithmetic both engines
    * compute identically (Σ 2^31·2^28 · 4 < 2^61 — no overflow).
    *
    * The XOR scramble is LOAD-BEARING: without it a digest that is
    * small in every chunk is the argmin under EVERY member (positive
    * combinations preserve coordinatewise dominance), and one such
    * shared shingle drove est-jaccard to 1.0 on ~disjoint docs
    * (measured: 43 false pairs at sf0.01). Per-member scrambling
    * destroys the shared small corner; the measured estimator tracks
    * exact jaccard again. Candidates stay exactly-verified downstream
    * in d02; d12's estimate-only contract relies on this family
    * quality, which DedupSpec pins on planted pairs.
    *
    * `x1..x4` must be PRE-MATERIALIZED columns (select the md5 hex
    * array first) — referencing a transform here would re-digest the
    * shingles once per family member. All 16 minima compute in ONE
    * fused codegen'd pass (functions.MinHashScrambled — the builtin
    * 16 × array_min(zip_with(...)) spelling allocated 32 intermediate
    * arrays per row and measured 3× slower on d02 at sf0.1). */
  def minhashSignature(x1: Column, x2: Column, x3: Column, x4: Column): Column =
    graft.functions.minhash_scrambled(x1, x2, x3, x4)

  /** 31-bit odd multiplier for family member i, chunk k (the kernel's
    * own table — ExprImpl holds the derivation). */
  private[operators] def mulConst(i: Int, k: Int): Long =
    graft.functions.ExprImpl.minhashMul(i, k)

  /** 28-bit XOR scrambler for family member i, chunk k. (Seed chosen so
    * LlmOpsSpec's planted jaccard-0.8 near-dup band-collides — an
    * 88%-probability event per seed; any fixed family either does or
    * doesn't, and the spec pins that this one does, with the signature
    * estimate 13/16 tracking the exact 0.806.) */
  private[operators] def xorConst(i: Int, k: Int): Long =
    graft.functions.ExprImpl.minhashXor(i, k)

  /** The 64 per-plane projection terms of the sign-random-projection
    * kernel (ExprImpl.lshSignBits), as SQL over an `emb` DOUBLE[]
    * column: ±1 hyperplane literals produced by the SAME mix64 the
    * kernel evaluates, so oracle and kernel cannot drift (s02's round-8
    * promotion; shared by d06's round-9 one). list_inner_product's
    * sequential double accumulation is bit-identical to the kernel loop
    * (verified offline in round 8). */
  def signAccTermsSql(dim: Int = 64): String =
    (0 until 64).map { p =>
      (0 until dim).map(d =>
        if ((graft.functions.ExprImpl.mix64(p.toLong * 1000003L + d)
          & 1L) == 0L) "1.0" else "-1.0")
        .mkString("list_inner_product(emb,[", ",", "])")
    }.mkString(",")

  /** [[scaled]] geometry replayed in SQL (integer arithmetic 1:1 —
    * bit-length via bin(), // division) as a `geo(bits, bands)` CTE
    * body over relation `src`'s exact row count. */
  def scaledGeoCteSql(src: String): String =
    s"""geo AS (
       |  SELECT least(16, greatest(4,
       |           length(bin(greatest(1, (COUNT(*) // 64) - 1))))) AS bits,
       |         greatest(2, least(8, 64 // least(16, greatest(4,
       |           length(bin(greatest(1, (COUNT(*) // 64) - 1))))))) AS bands
       |  FROM $src)""".stripMargin

  /** The SQL spelling of [[minhashSignature]] over chunk-array columns
    * x1..x4 — one `list_min(...)` term per family member, constants
    * emitted from the same derivation as the kernel. */
  def minhashSigSqlList: String =
    (0 until MinhashBands * MinhashRows).map { i =>
      s"list_min([${mulConst(i, 0)}*xor(x1[j],${xorConst(i, 0)}) + " +
        s"${mulConst(i, 1)}*xor(x2[j],${xorConst(i, 1)}) + " +
        s"${mulConst(i, 2)}*xor(x3[j],${xorConst(i, 2)}) + " +
        s"${mulConst(i, 3)}*xor(x4[j],${xorConst(i, 3)}) " +
        "for j in range(1, len(x1) + 1)])"
    }.mkString("[", ",\n     ", "]")

  /** Per-band buckets of a [[minhashSignature]]: the ":"-joined decimal
    * render (d13's proven-portable form) collapsed to a 60-bit integer
    * via the md5Hash60 kernel — band joins then shuffle and compare
    * 8-byte keys instead of ~80-byte strings (what matters when the
    * candidate join is the only corpus-wide shuffle at 100 TB). A
    * 2^-60 accidental bucket collision only ADDS a candidate, which
    * the exact verify filters, and the oracle replays the same hash so
    * both engines see the identical candidate set. */
  def minhashBuckets(mh: Column): Column =
    array((0 until MinhashBands).map(b =>
      Shingles.md5Hash60(concat_ws(":", (0 until MinhashRows).map(r =>
        get(mh, lit(b * MinhashRows + r))): _*))): _*)
}
