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
}
