package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** The ONE word-shingle implementation (d02/d04/t04 share it — three
  * inline copies previously diverged on the short-document guard, which
  * produced a real crash: sequence(1, n) with n <= 0 generates a
  * DESCENDING sequence and slice(ws, 0, w) throws).
  *
  * `ws` must be a PRE-SPLIT word-array column: an expression inside a
  * transform() lambda is re-evaluated per element, so splitting in here
  * would make shingling O(words²) per document.
  */
object Shingles {

  private def windows(ws: Column, width: Int, make: Column => Column): Column =
    transform(sequence(lit(1), size(ws) - (width - 1)),
      i => make(concat_ws(" ", slice(ws, i, lit(width)))))

  /** width-word shingle hashes; short docs fall back to one whole-text
    * hash (the d02/t04 contract: every doc gets a non-empty signature).
    * `h` is the hash kernel: xxhash64 (codegen'd, default — d02) or an
    * oracle-portable one (t04's md5-prefix, matching DuckDB exactly). */
  def hashes(ws: Column, text: Column, width: Int,
      h: Column => Column = xxhash64(_)): Column =
    when(size(ws) >= width, windows(ws, width, h))
      .otherwise(array(h(text)))

  /** 60-bit integer hash both engines compute identically: the first 15
    * hex digits of md5, parsed base-16 (DuckDB 0x-cast; the engine side
    * is the codegen'd Md5Window — digest bytes straight to long, no hex
    * render/conv parse per token, bit-identical by Md5WindowSpec).
    * Positive, collision-safe at corpus scale (2^60 space), and exactly
    * reproducible in the oracle — unlike xxhash64, which DuckDB lacks. */
  def md5Hash60(c: Column): Column =
    graft.functions.md5_window(c, 0, 15)

  /** width-word shingle strings; short docs yield an EMPTY set (the d04
    * contract, matching its DuckDB oracle: no shingles → NULL/NaN jaccard
    * → pair filtered). */
  def strings(ws: Column, width: Int): Column =
    when(size(ws) >= width, windows(ws, width, identity))
      .otherwise(array().cast(ArrayType(StringType)))

  /** width-word shingle STRINGS with the whole-text fallback (the d02
    * contract — every doc gets a non-empty signature input; [[hashes]]
    * is the same shape already hashed). Split out so d02/d12 can md5
    * the shingle once and derive the whole portable minhash family from
    * that one digest. */
  def stringsWithFallback(ws: Column, text: Column, width: Int): Column =
    when(size(ws) >= width, windows(ws, width, identity))
      .otherwise(array(text))

  /** [[md5Hash60]] applied to an already-computed md5 hex column. */
  def md5Hash60Of(hex: Column): Column =
    conv(substring(hex, 1, 15), 16, 10).cast("long")

  /** 28-bit chunk `part` ∈ 0..3 of an md5 hex digest (7 hex digits at
    * offsets 1/8/15/22) — the four independent coordinates
    * [[Lsh.minhashSignature]] mixes per family member. 28 bits keeps
    * every 31-bit·28-bit product sum < 2^61: no BIGINT overflow in
    * either engine. */
  def md5Chunk28(hex: Column, part: Int): Column =
    conv(substring(hex, 1 + 7 * part, 7), 16, 10).cast("long")
}
