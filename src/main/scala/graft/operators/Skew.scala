package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q22 — skew-salted join (SURVEY.md §6 "salting for skew").
  *
  * When one join key carries a disproportionate share of the fact rows, a
  * plain equi-join sends that whole key to ONE reducer. Salting widens the
  * shuffle key: the fact side gets a deterministic salt in [0, S), the dim
  * side is replicated S times, and the join runs on (key, salt) — the hot
  * key's rows spread over S reducers. AQE's skew-join split handles the
  * sort-merge case at runtime; explicit salting is the plan-level tool
  * when the skew is known (and works for aggregations feeding joins,
  * which AQE's splitter does not cover).
  *
  * Cost model: dim side inflates S×, so salt only dimension-sized right
  * sides (or pre-filter to the known-hot keys and union with an unsalted
  * join of the rest — the "split skew" refinement noted in PERF.md).
  */
object Skew {

  /** Salted inner equi-join. `saltSrc` must be a deterministic fact-side
    * column (any id) — it only spreads rows, never changes results.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, saltSrc: Column,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(saltedDim,
        col(factKey) === col(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** q22 — events fact joined to a derived per-user dim through the salted
    * path. Same rows as the plain join (oracle); ExplainAuditSpec pins the
    * widened (user_id, __salt) shuffle key.
    */
  def q22SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val dim = e.groupBy(col("user_id").as("d_user_id"))
      .agg(count(lit(1)).as("user_events"))
    saltedJoin(e.select(col("event_id"), col("user_id"), col("value")),
        dim, "user_id", "d_user_id", col("event_id"), salts = 8)
      .select(col("event_id"), col("user_id"), col("value"),
        col("user_events"))
      .orderBy(col("event_id"))
  }

  val oracle: Map[String, String] = Map(
    "q22_salted_join" ->
      """SELECT event_id, user_id, value, user_events
        |FROM events
        |JOIN (SELECT user_id AS d_user_id, COUNT(*) AS user_events
        |      FROM events GROUP BY user_id) d
        |  ON user_id = d_user_id
        |ORDER BY event_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_salted_join" -> (q22SaltedJoin _)
  )
}
