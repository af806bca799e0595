package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Core relational operators — the reference's pipeline shapes re-expressed
  * as declarative Spark plans over the test tables (SURVEY.md §2 / §4).
  *
  * Correctness contract with the DuckDB oracle (SURVEY.md §5): exact decimal
  * aggregation (double SUM is order-dependent, decimal is not), final cast
  * back to double for engine-independent schemas, and a total ORDER BY so
  * row order is deterministic on both sides.
  */
object Relational {

  /** Exact-sum helper: aggregate doubles through DecimalType then back. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** q01 — scan→filter→groupBy→agg with pushdown.
    * Shape of swap_prices.py:197-202 (group_by + sum aggregates over a
    * block-range filter).
    */
  def q01AggFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") <= lit("1997-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val oracle: Map[String, String] = Map(
    "q01_agg_filter" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_filter" -> (q01AggFilter _)
  )
}
