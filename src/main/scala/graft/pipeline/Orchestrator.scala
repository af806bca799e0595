package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ChainDict

/** Config/orchestration surface — the scripts/main.py twin.
  *
  * The reference's entry point reads everything from the environment
  * (CHERRY_PIPELINE_KIND/NAME, CHERRY_EVM_CHAIN_ID, CHERRY_FROM_BLOCK /
  * CHERRY_TO_BLOCK, main.py:221-334), validates it (unknown kind/name and
  * malformed ints fail fast), resolves the chain dictionary, and
  * dispatches into a named registry of pipelines per kind
  * (_EVM_PIPELINES / _SVM_PIPELINES, main.py:284-297).
  *
  * The Spark twin keeps that exact surface: an env map (injectable for
  * tests, `sys.env` by default) parses into a typed [[JobConfig]];
  * `dispatch` looks up the named pipeline twin, applies the [from, to)
  * key-range prune — the incremental-batch window the reference passes to
  * its provider — and for EVM jobs tags rows with (chain_id, chain_name)
  * from the broadcast dictionary, exactly what SET_CHAIN_ID + dictGet do
  * in the reference's ClickHouse steps. Because the range prune is a
  * plain predicate on the fact key, Catalyst pushes it through the
  * pipeline's joins to the parquet scan — config-driven partition
  * pruning, not a post-filter.
  */
object Orchestrator {

  final case class JobConfig(
      pipelineKind: String,
      pipelineName: String,
      chainId: Option[Long],
      fromKey: Long,
      toKey: Option[Long])

  /** Env keys — GRAFT_* analogs of the CHERRY_* variables. */
  val KindVar = "GRAFT_PIPELINE_KIND"
  val NameVar = "GRAFT_PIPELINE_NAME"
  val ChainVar = "GRAFT_EVM_CHAIN_ID"
  val FromVar = "GRAFT_FROM_KEY"
  val ToVar = "GRAFT_TO_KEY"

  private def toLong(env: Map[String, String], key: String): Option[Long] =
    env.get(key).map { v =>
      try v.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"$key must be an integer, got '$v'")
      }
    }

  /** Parse + validate — malformed config fails fast with the offending
    * variable named (main.py:197-218 _to_int/_to_provider_kind). */
  def loadConfig(env: Map[String, String] = sys.env): JobConfig = {
    val kind = env.getOrElse(KindVar,
      throw new IllegalArgumentException(s"$KindVar is required"))
    require(kind == "evm" || kind == "svm",
      s"unknown $KindVar '$kind', allowed values are evm and svm")
    val name = env.getOrElse(NameVar,
      throw new IllegalArgumentException(s"$NameVar is required"))
    val registry = if (kind == "evm") evmPipelines else svmPipelines
    require(registry.contains(name),
      s"unknown $kind pipeline '$name', have: ${registry.keys.toSeq.sorted.mkString(", ")}")
    val chainId = toLong(env, ChainVar)
    if (kind == "evm") {
      val id = chainId.getOrElse(
        throw new IllegalArgumentException(s"$ChainVar is required for evm"))
      require(ChainDict.entries.exists(_._1 == id),
        s"$ChainVar $id is not a known chain")
    }
    JobConfig(kind, name,
      chainId = if (kind == "evm") chainId else None,
      fromKey = toLong(env, FromVar).getOrElse(0L),
      toKey = toLong(env, ToVar))
  }

  /** Named pipeline registries (main.py:284-297) mapped to the pipeline
    * twins, each tagged with its range-prune key column — None for
    * pipelines with no block-keyed data (the dictionary pipelines): a
    * block range must never silently filter dictionary entries. */
  final case class Entry(
      run: (SparkSession, String) => DataFrame, keyCol: Option[String])
  object Entry {
    def apply(run: (SparkSession, String) => DataFrame,
        keyCol: String): Entry = Entry(run, Some(keyCol))
  }

  /** The two dictionary pipelines in the reference's _EVM_PIPELINES
    * (chain_name.py / chain_id.py): materialize the chain mapping keyed
    * by id and by name respectively. */
  private def chainNameDict(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ChainDict.entries.toDF("chain_id", "chain_name").orderBy(col("chain_id"))
  }
  private def chainIdDict(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ChainDict.entries.map(_.swap).toDF("chain_name", "chain_id")
      .orderBy(col("chain_name"))
  }

  val evmPipelines: Map[String, Entry] = Map(
    "erc20_transfers" ->
      Entry(graft.operators.Pipelines.p03Erc20Pipeline, "l_orderkey"),
    "event_decode" ->
      Entry(graft.operators.Pipelines.p06EventDecode, "l_orderkey"),
    "chain_name" -> Entry(chainNameDict, None),
    "chain_id" -> Entry(chainIdDict, None))

  val svmPipelines: Map[String, Entry] = Map(
    "orca_swaps" ->
      Entry(graft.operators.Pipelines.p01SwapsPipeline, "user_id"),
    "swap_prices" ->
      Entry(graft.operators.Pipelines.p02VwapPipeline, "user_id"),
    "raydium_swaps" ->
      Entry(graft.operators.SvmInstr.p04RaydiumPipeline, "event_id"),
    "orca_metadata" ->
      Entry(graft.operators.SvmInstr.p05OrcaMetadata, "block_slot"))

  /** Run the configured pipeline over `sfDir`: registry lookup, [from,
    * to) key prune, EVM chain tag. */
  def dispatch(spark: SparkSession, cfg: JobConfig, sfDir: String): DataFrame = {
    // re-validate here: a hand-built JobConfig that skipped loadConfig
    // must fail with the same named errors, not a bare NoSuchElement
    val registry = if (cfg.pipelineKind == "evm") evmPipelines else svmPipelines
    val entry = registry.getOrElse(cfg.pipelineName,
      throw new IllegalArgumentException(
        s"unknown ${cfg.pipelineKind} pipeline '${cfg.pipelineName}', " +
          s"have: ${registry.keys.toSeq.sorted.mkString(", ")}"))
    val base = entry.run(spark, sfDir)
    val ranged = entry.keyCol match {
      case Some(k) =>
        cfg.toKey.foldLeft(base.filter(col(k) >= cfg.fromKey))(
          (df, to) => df.filter(col(k) < to))
      case None => base // no block-keyed data — range does not apply
    }
    cfg.chainId match {
      // tag only pipelines that don't already carry chain columns: the
      // dictionary pipelines' OWN chain_id/chain_name must never be
      // clobbered by the job's configured chain
      case Some(id) if !ranged.columns.contains("chain_id") =>
        val name = ChainDict.entries.find(_._1 == id).map(_._2).getOrElse(
          throw new IllegalArgumentException(s"$ChainVar $id is not a known chain"))
        ranged.withColumn("chain_id", lit(id))
          .withColumn("chain_name", lit(name))
      case _ => ranged
    }
  }

  // ---- driver-verified query entry ----

  /** k06 — the orchestration surface as a query: an env map configures an
    * EVM erc20_transfers run on ethereum over key range [100, 2000); the
    * oracle is the ranged, chain-tagged p03 answer. */
  def k06Orchestrator(spark: SparkSession, dir: String): DataFrame = {
    val cfg = loadConfig(Map(
      KindVar -> "evm", NameVar -> "erc20_transfers",
      ChainVar -> "1", FromVar -> "100", ToVar -> "2000"))
    dispatch(spark, cfg, dir)
  }

  val oracle: Map[String, String] = Map(
    "k06_orchestrator" ->
      """SELECT l_orderkey, l_linenumber,
        |  printf('%040x', l_partkey) AS from_addr,
        |  printf('%040x', l_suppkey) AS to_addr,
        |  CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
        |    AS amount,
        |  o_orderdate, 1 AS chain_id, 'ethereum' AS chain_name
        |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_orderkey >= 100 AND l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k06_orchestrator" -> (k06Orchestrator _)
  )
}
