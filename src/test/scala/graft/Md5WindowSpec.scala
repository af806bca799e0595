package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Shingles

/** The digest-direct Md5Window/Md5Family expressions must stay
  * BIT-IDENTICAL to the hex spelling `conv(substring(md5(c), s+1, len),
  * 16, 10)` that every portable-family DuckDB oracle replays — the
  * operators compute with the fused expressions, the oracles with the
  * hex chain, and this equality is the bridge. Inputs cover the token
  * shapes the operators actually hash: empty strings (split(" ") keeps
  * them), multi-byte UTF-8, long shingles, and digests whose leading
  * nibble ≥ 8 (sign-extension trap for a naive byte cast).
  */
class Md5WindowSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private val samples = Seq(
    "", " ", "a", "the quick brown fox", "naïve café – 日本語テキスト",
    "0:alpha beta gamma", "x" * 500,
    // md5("jk8ssl") = 0... leading-zero digest regression guard
    "jk8ssl",
    // first digest byte ≥ 0x80 (md5("a") = 0cc175..., md5("c") = 4a8a08...,
    // md5("d") = 8277e0... — covers high bit set)
    "d", "b", "delta")

  /** The hex chain the DuckDB oracles replay, spelled with Spark
    * builtins — the pre-round-9 engine formulation. */
  private def hexWindow(c: org.apache.spark.sql.Column, start: Int, len: Int) =
    conv(substring(md5(c), start + 1, len), 16, 10).cast("long")

  test("md5_window(0,15) == conv(substring(md5,1,15),16,10) on all samples") {
    import spark.implicits._
    val rows = samples.toDF("s")
      .select(functions.md5_window(col("s"), 0, 15).as("fast"),
        hexWindow(col("s"), 0, 15).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("all four 28-bit chunk windows match the hex chain") {
    import spark.implicits._
    (0 until 4).foreach { k =>
      val rows = samples.toDF("s")
        .select(functions.md5_window(col("s"), 7 * k, 7).as("fast"),
          hexWindow(col("s"), 7 * k, 7).as("slow"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"chunk $k"))
    }
  }

  test("md5_family packs [hash60, x1..x4] of one digest") {
    import spark.implicits._
    val rows = samples.toDF("s")
      .select(functions.md5_family(col("s")).as("fam"),
        hexWindow(col("s"), 0, 15).as("h60"),
        hexWindow(col("s"), 0, 7).as("c0"), hexWindow(col("s"), 7, 7).as("c1"),
        hexWindow(col("s"), 14, 7).as("c2"), hexWindow(col("s"), 21, 7).as("c3"))
      .collect()
    rows.foreach { r =>
      val fam = r.getSeq[Long](0)
      assert(fam === Seq(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }
  }

  test("Shingles.md5Hash60 (the operator entry point) rides md5_window") {
    import spark.implicits._
    val rows = samples.toDF("s")
      .select(Shingles.md5Hash60(col("s")).as("fast"),
        Shingles.md5Hash60Of(md5(col("s"))).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null propagates; works from SQL text") {
    functions.registerSql(spark)
    val r = spark.sql(
      "SELECT md5_window(CAST(NULL AS STRING), 0, 15), md5_window('abc', 0, 15), " +
        "md5_family('abc')[0]").collect().head
    assert(r.isNullAt(0))
    assert(r.getLong(1) === r.getLong(2))
  }
}
