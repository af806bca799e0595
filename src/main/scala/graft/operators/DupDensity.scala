package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dup-density probe gating the exact-dup pre-collapse.
  *
  * The pre-collapse (signatures/verification once per DISTINCT text or
  * vector, membership expanded back afterwards) is the correct crawl
  * discipline at scale — the sf1/sf10 rehearsals measured 3–20×
  * savings on 10×-verbatim corpora — but on a LOW-dup corpus its
  * dropDuplicates + expansion joins are pure overhead (~+5–30% at
  * sf0.1, round-5 minima). One cheap probe chooses the path: a single
  * aggregate of count vs approx_count_distinct(key). The HLL sketch is
  * map-side mergeable, so the probe is one pass with a KB-sized
  * shuffle — never a dedup shuffle of the corpus.
  *
  * BOTH paths are maintained output-identical (DupGateSpec proves
  * equality on dup-heavy, degenerate, and unique corpora), so the gate
  * is purely a cost chooser, never a semantics switch.
  */
object DupDensity {

  final case class Density(rows: Long, distinctEst: Long) {
    /** Collapse pays once ≥~10% of rows are verbatim copies. The 10%
      * margin also absorbs the HLL estimation error (rsd 2%): a fully
      * unique corpus can never be misread as collapsible. */
    def collapseWorthIt: Boolean = distinctEst < rows - rows / 10
  }

  /** One-pass probe: exact row count + HLL distinct estimate of `key`
    * (the collapse key — md5(text) or the embedding hash). */
  def probe(df: DataFrame, key: Column): Density = {
    val r = df.agg(count(lit(1)), approx_count_distinct(key, 0.02)).head()
    Density(r.getLong(0), r.getLong(1))
  }
}
