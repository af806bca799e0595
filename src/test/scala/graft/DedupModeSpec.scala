package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupAssignment, DedupPairs}

/** The output-mode contract (round 11): d02/d06's `DedupAssignment`
  * flag must (a) equal the standalone d14/d15 operators row-for-row,
  * and (b) be DERIVABLE from the same operator's `DedupPairs` output —
  * the keep-first canonical recomputed per-doc from the pair list is
  * the assignment. (b) is the real cross-mode pin: pairs and
  * assignment are two projections of one near-dup relation, so any
  * drift between the banding machineries would break the re-derivation
  * even if (a) still held.
  */
class DedupModeSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  private val sfDir = SparkSessionFixture.sfDir

  /** Keep-first canonical from an undirected pair list: canonical(d) =
    * min({d} ∪ partners(d)); everything else is its own canonical. */
  private def canonFromPairs(ids: Seq[Long],
      pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val best = scala.collection.mutable.Map.empty[Long, Long]
    pairs.foreach { case (a, b) =>
      best(b) = math.min(best.getOrElse(b, b), a)
      best(a) = math.min(best.getOrElse(a, a), b)
    }
    ids.map(d => d -> math.min(d, best.getOrElse(d, d))).toMap
  }

  private def assertModes(assign: org.apache.spark.sql.DataFrame,
      standalone: org.apache.spark.sql.DataFrame,
      ids: Seq[Long], pairs: Seq[(Long, Long)]): Unit = {
    // (a) the flag path IS the standalone operator
    assert(assign.except(standalone).count() === 0L)
    assert(standalone.except(assign).count() === 0L)
    // (b) pairs-mode re-derivation lands on the same assignment
    val want = canonFromPairs(ids, pairs)
    val got = assign.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (d, c) =>
      assert(got(d) === ((c, c < d)),
        s"doc $d: assignment ${got(d)} != pair-derived ($c, ${c < d})")
    }
  }

  test("d02: assignment mode == d14, and the pair mode derives it") {
    val pairs = Dedup.d02DedupMinhash(spark, sfDir, DedupPairs)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assertModes(Dedup.d02DedupMinhash(spark, sfDir, DedupAssignment),
      Dedup.d14DedupAssign(spark, sfDir), ids, pairs.toSeq)
  }

  test("d06: assignment mode == d15, and the pair mode derives it") {
    val pairs = Dedup.d06DedupEmbeddingLsh(spark, sfDir, DedupPairs)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assertModes(Dedup.d06DedupEmbeddingLsh(spark, sfDir, DedupAssignment),
      Dedup.d15EmbeddingAssign(spark, sfDir), ids, pairs.toSeq)
  }
}
