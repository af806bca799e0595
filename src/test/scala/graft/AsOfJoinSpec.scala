package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** Edge-case semantics of the native as-of join (plans.AsOfJoin) on
  * crafted inputs — ties, unmatched keys, key boundaries, null filtering.
  * q23's DuckDB oracle covers the operator statistically at 10k rows;
  * these pin the contract explicitly.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long, Long)])
      : Map[(Long, Long), Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("k", "t")
    val r = right.toDF("rk", "rt", "payload")
    AsOf.join(l, r, "k", "t", "rk", "rt", "payload")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1)) ->
        (if (row.isNullAt(4)) None else Some(row.getLong(4))))
      .toMap
  }

  test("picks the latest right row at or before each left time") {
    val got = run(
      left = Seq((1L, 10L), (1L, 20L), (1L, 30L)),
      right = Seq((1L, 5L, 100L), (1L, 15L, 200L), (1L, 25L, 300L)))
    assert(got === Map((1L, 10L) -> Some(100L), (1L, 20L) -> Some(200L),
      (1L, 30L) -> Some(300L)))
  }

  test("exact time tie matches (<= semantics); payload tie takes greatest") {
    val got = run(
      left = Seq((1L, 10L)),
      right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 11L, 99L)))
    assert(got === Map((1L, 10L) -> Some(9L)))
  }

  test("left keys with no right rows, or only future right rows, get null") {
    val got = run(
      left = Seq((1L, 10L), (2L, 10L), (3L, 10L)),
      right = Seq((1L, 20L, 1L), (3L, 5L, 3L)))
    assert(got === Map((1L, 10L) -> None, (2L, 10L) -> None,
      (3L, 10L) -> Some(3L)))
  }

  test("candidate state resets across key boundaries") {
    // key 2's early left row must NOT see key 1's candidate
    val got = run(
      left = Seq((1L, 100L), (2L, 1L)),
      right = Seq((1L, 50L, 111L)))
    assert(got === Map((1L, 100L) -> Some(111L), (2L, 1L) -> None))
  }

  test("rows with null key or time are filtered per the v1 contract") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((1L, 5L, 42L)).toDF("rk", "rt", "payload")
    val rows = AsOf.join(l, r, "k", "t", "rk", "rt", "payload").collect()
    assert(rows.length === 1 && rows.head.getLong(4) === 42L)
  }
}
