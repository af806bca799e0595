package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed provider-request model — the `cherry_core.ingest` query twin.
  *
  * The reference describes every provider pull as a typed request: a
  * block range, per-table row requests (which logs / instructions to
  * return, by topic0 or program-id + discriminator prefix), and a
  * per-table FIELD SELECTION naming exactly the columns the pipeline
  * needs (erc20_transfers.py:86-116 `ingest.evm.Query`,
  * orca_swaps.py:487-550 `ingest.svm.Query`, config.py:10-24). The
  * provider prunes and filters server-side, so a pipeline never ships a
  * column or row it won't use.
  *
  * The Spark twin keeps that contract but compiles it to what a Spark
  * cluster's "provider" is: parquet scans with the range and row
  * predicates PUSHED (PushedFilters) and the field selection PRUNED
  * (ReadSchema) — enforced as plan contracts in OrchestratorSpec, not
  * hoped for. One request application ([[applyLogRequest]]) is shared by
  * the batch compiler and the streaming entry (st21), so batch and
  * stream cannot drift.
  *
  * Table binding to the driver's testdata: `events` plays the
  * logs/instructions stream (event_id = block number, event_type =
  * topic0 / program id, props = payload), `orders` plays blocks
  * (o_orderkey = number), `lineitem` plays token balances. The binding
  * is data, the request/compile machinery is the contract.
  */
object IngestRequest {

  /** Half-open incremental batch window [fromBlock, toBlock) —
    * config.py's from_block/to_block pair; `None` = "to tip". */
  final case class BlockRange(fromBlock: Long, toBlock: Option[Long]) {
    def predicate(key: Column): Column =
      toBlock.foldLeft(key >= fromBlock)((p, to) => p && key < to)
  }

  /** ingest.evm.LogRequest (erc20_transfers.py:91-97): which logs to
    * return — any of the listed topic0s — and whether the matching
    * blocks table rides along. */
  final case class LogRequest(
      topic0: Seq[String] = Nil,
      includeBlocks: Boolean = false)

  /** ingest.evm.Fields (erc20_transfers.py:99-113): per-table column
    * selections. Empty set = table not requested. */
  final case class EvmFields(
      block: Seq[String] = Nil,
      log: Seq[String] = Nil)

  final case class EvmQuery(
      range: BlockRange,
      logs: Seq[LogRequest] = Nil,
      fields: EvmFields = EvmFields())

  /** ingest.svm.InstructionRequest (orca_swaps.py:491-501): program-id
    * membership + discriminator prefixes, plus the include_* flags that
    * pull companion tables. */
  final case class InstructionRequest(
      programId: Seq[String] = Nil,
      discriminator: Seq[String] = Nil,
      includeTransactions: Boolean = false,
      includeBlocks: Boolean = false,
      includeTransactionTokenBalances: Boolean = false)

  final case class SvmFields(
      block: Seq[String] = Nil,
      transaction: Seq[String] = Nil,
      instruction: Seq[String] = Nil,
      tokenBalance: Seq[String] = Nil)

  final case class SvmQuery(
      range: BlockRange,
      instructions: Seq[InstructionRequest] = Nil,
      fields: SvmFields = SvmFields())

  private def selectFields(df: DataFrame, fields: Seq[String],
      table: String): DataFrame = {
    require(fields.nonEmpty, s"$table requested with empty field selection")
    val missing = fields.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"$table has no field(s) ${missing.mkString(", ")}")
    df.select(fields.map(col): _*)
  }

  /** The one request application: range prune + topic0 membership +
    * field selection. Works identically on a batch table and a streaming
    * source — all three pieces are plain predicates/projections, so
    * Catalyst pushes them into the scan either way. */
  def applyLogRequest(logs: DataFrame, q: EvmQuery,
      keyCol: String = "event_id",
      topic0Col: String = "event_type"): DataFrame = {
    val topics = q.logs.flatMap(_.topic0).distinct
    val ranged = logs.filter(q.range.predicate(col(keyCol)))
    val matched =
      if (topics.isEmpty) ranged
      else ranged.filter(col(topic0Col).isin(topics: _*))
    selectFields(matched, q.fields.log, "log")
  }

  /** Instruction-request application: program-id membership +
    * discriminator PREFIX match (the reference filters on binary
    * discriminator prefixes; the testdata payload is props). */
  def applyInstructionRequest(instructions: DataFrame, q: SvmQuery,
      keyCol: String = "event_id",
      programCol: String = "event_type",
      dataCol: String = "props"): DataFrame = {
    val programs = q.instructions.flatMap(_.programId).distinct
    val discs = q.instructions.flatMap(_.discriminator).distinct
    val ranged = instructions.filter(q.range.predicate(col(keyCol)))
    val byProgram =
      if (programs.isEmpty) ranged
      else ranged.filter(col(programCol).isin(programs: _*))
    val byDisc =
      if (discs.isEmpty) byProgram
      else byProgram.filter(
        discs.map(d => col(dataCol).startsWith(d)).reduce(_ || _))
    selectFields(byDisc, q.fields.instruction, "instruction")
  }

  /** Compile an EVM request to its pruned scans — the provider response,
    * one DataFrame per requested table. */
  def compileEvm(spark: SparkSession, dir: String,
      q: EvmQuery): Map[String, DataFrame] = {
    val t = graft.sources.Tables(spark, dir)
    val logs = Map("logs" -> applyLogRequest(t.events, q))
    val blocks =
      if (q.logs.exists(_.includeBlocks))
        Map("blocks" -> selectFields(
          t.orders.filter(q.range.predicate(col("o_orderkey"))),
          q.fields.block, "block"))
      else Map.empty[String, DataFrame]
    logs ++ blocks
  }

  /** Compile an EVM request against a REMOTE arrow-http portal instead
    * of local parquet — the reference's actual deployment shape (the
    * typed query goes to a hypersync/SQD endpoint, not a file). The
    * same [[applyLogRequest]] applies the same predicates/projections;
    * the k26 scan builder then turns the range into the request's
    * from/to_block, the topic0 membership into its event_types, and the
    * field selection into the wire column list — so the provider
    * filters and projects server-side, exactly as cherry_core.ingest
    * promises. One request type, three providers: parquet (compileEvm),
    * parquet-stream (st21), portal (this + st22's stream). */
  def compileEvmHttp(spark: SparkSession, url: String,
      q: EvmQuery): DataFrame =
    applyLogRequest(
      spark.read.format("arrow-http").option("url", url).load(), q)

  /** Compile an SVM request: instructions plus whichever companion
    * tables the include_* flags pull (orca_swaps.py:495-500). */
  def compileSvm(spark: SparkSession, dir: String,
      q: SvmQuery): Map[String, DataFrame] = {
    val t = graft.sources.Tables(spark, dir)
    val ins = Map("instructions" -> applyInstructionRequest(t.events, q))
    val txs =
      if (q.instructions.exists(_.includeTransactions))
        Map("transactions" -> selectFields(
          t.orders.filter(q.range.predicate(col("o_orderkey"))),
          q.fields.transaction, "transaction"))
      else Map.empty[String, DataFrame]
    val balances =
      if (q.instructions.exists(_.includeTransactionTokenBalances))
        Map("token_balances" -> selectFields(
          t.lineitem.filter(q.range.predicate(col("l_orderkey"))),
          q.fields.tokenBalance, "token_balance"))
      else Map.empty[String, DataFrame]
    ins ++ txs ++ balances
  }
}
