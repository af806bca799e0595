package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Batched BPE training specs: merges per round are the maximal
  * symbol-disjoint PREFIX of the ranked pair list — provably the same
  * merge sequence as one-merge-per-round greedy (the equivalence
  * argument lives on bpeTrain's Scaladoc) at a fraction of the driver
  * round-trips, so a production 32k-merge vocabulary is thousands of
  * Spark jobs, not 32k.
  */
class BpeBatchSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private def docsOf(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("bpeDisjointPrefix stops at the first symbol conflict") {
    val ranked = Seq(("a", "b", 10L), ("c", "d", 9L), ("d", "e", 8L),
      ("f", "g", 7L))
    // (d,e) shares d with the selected (c,d): the batch must END there —
    // (f,g) is disjoint but taking it could skip a sequential winner
    assert(TextAnalysis.bpeDisjointPrefix(ranked) ===
      Seq(("a", "b", 10L), ("c", "d", 9L)))
    assert(TextAnalysis.bpeDisjointPrefix(Seq(("a", "a", 5L))) ===
      Seq(("a", "a", 5L)))
    assert(TextAnalysis.bpeDisjointPrefix(
      Seq(("a", "b", 5L), ("b", "c", 4L))) === Seq(("a", "b", 5L)))
  }

  test("12 merges complete in <= 3 rounds on a disjoint-pair corpus") {
    // ten words x_i y_i x_i y_i over disjoint letter pairs, strictly
    // descending frequencies: round 1 takes all ten (x_i, y_i) merges
    // in ONE batch (counts 2f_i all outrank the f_i-count tail), the
    // remaining 2 merges conflict chain-wise and go one per round
    val words = (0 until 10).map { i =>
      val x = ('a' + 2 * i).toChar; val y = ('a' + 2 * i + 1).toChar
      s"$x$y$x$y"
    }
    val texts = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(100 - i)(w)
    }
    val model = TextAnalysis.bpeTrain(docsOf(texts), 12)
    model.vocab.unpersist()
    assert(model.merges.size === 12)
    assert(model.rounds <= 3, s"12 merges took ${model.rounds} rounds")
    // and the batched sequence IS the sequential one
    val seq1 = TextAnalysis.bpeTrain(docsOf(texts), 12, batchK = 1)
    seq1.vocab.unpersist()
    assert(seq1.rounds === 12)
    assert(model.merges === seq1.merges,
      "batched merge sequence diverged from sequential greedy")
  }

  test("batched == sequential byte-identical on the sf documents table") {
    val docs = spark.read
      .parquet(s"${SparkSessionFixture.sfDir}/documents.parquet")
      .select("text")
    val batched = TextAnalysis.bpeMerges(docs, 8).collect().toSeq
    val seq1 = TextAnalysis.bpeMerges(docs, 8, batchK = 1).collect().toSeq
    assert(batched === seq1)
  }
}
