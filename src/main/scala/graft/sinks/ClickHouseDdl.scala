package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** ClickHouse DDL + type-mapping generator — the missing dialect half of
  * the k01/k02 sink contract.
  *
  * Every reference pipeline terminates in a hand-written ClickHouse
  * `CREATE TABLE` (erc20_transfers.py:32-51, orca_swaps.py:180-219,
  * raydium_swaps.py:270-305, meteora_swaps.py:135-186,
  * orca_metadata.py:120-143, swap_prices.py:29-41) or the
  * EmbeddedRocksDB + DICTIONARY pair (db.py:48-77, token_decimals.py:25-34).
  * This module derives that DDL from a Spark `StructType` plus a
  * [[ChTable]] physical spec (the same (partition, sort) contract k01's
  * parquet writer already takes), so the sink tier can CREATE its own
  * target tables instead of assuming they exist — the first thing a real
  * user of the reference needs when pointing the engine at ClickHouse.
  *
  * Spark has no unsigned integer types and caps DECIMAL at precision 38,
  * so two hints close the semantic gap: `unsigned` marks columns whose
  * Spark signed type carries unsigned domain values (block numbers,
  * slots), and `typeOverrides` pins columns whose ClickHouse type is
  * wider than Spark can express (u256 amounts → `Decimal256(0)`).
  * Golden specs compare the generated DDL against the reference's
  * literal DDL (ClickHouseDdlSpec + the k23 VALUES oracle).
  */
object ClickHouseDdl {

  /** JDBC dialect for `jdbc:clickhouse:` URLs: maps Spark write types
    * through [[chType]] (so a JDBC-created table gets real ClickHouse
    * types, not the generic SQL fallbacks), backtick-quotes identifiers,
    * and reports no cascading truncate (MergeTree TRUNCATE is flat).
    * Registered lazily the first time a ClickHouse-URL [[Writers.JdbcSink]]
    * is constructed — URL-gated exactly as the Derby scratch tuning is. */
  private object GraftClickHouseDialect
      extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:clickhouse")
    override def getJDBCType(dt: DataType)
        : Option[org.apache.spark.sql.jdbc.JdbcType] =
      Some(org.apache.spark.sql.jdbc.JdbcType(
        chType(dt), java.sql.Types.OTHER))
    override def quoteIdentifier(colName: String): String = s"`$colName`"
    override def isCascadingTruncateTable(): Option[Boolean] = Some(false)
  }

  private lazy val registerDialect: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects
      .registerDialect(GraftClickHouseDialect): Unit

  /** Called by JdbcSink when its URL is a ClickHouse one. Idempotent. */
  private[sinks] def ensureDialect(): Unit = registerDialect

  sealed trait ChIndex { def ddl: String }
  /** minmax skip index — `INDEX ts_idx timestamp TYPE minmax GRANULARITY 4`
    * (erc20_transfers.py:44). The parquet twin is k16's footer min/max. */
  final case class MinMaxIndex(name: String, column: String,
      granularity: Int = 4) extends ChIndex {
    def ddl: String = s"INDEX $name ${quote(column)} TYPE minmax " +
      s"GRANULARITY $granularity"
  }
  /** bloom_filter skip index — `INDEX from_idx \`from\` TYPE
    * bloom_filter(0.01) GRANULARITY 4` (erc20_transfers.py:45-46). The
    * parquet twin is k01's per-column bloom option. */
  final case class BloomIndex(name: String, column: String,
      fpp: Double = 0.01, granularity: Int = 4) extends ChIndex {
    def ddl: String = s"INDEX $name ${quote(column)} TYPE bloom_filter(" +
      BigDecimal(fpp).underlying.stripTrailingZeros.toPlainString +
      s") GRANULARITY $granularity"
  }

  /** Physical table spec: same contract as k01's partitioned+sorted
    * parquet writer, rendered as MergeTree clauses instead. */
  final case class ChTable(
      name: String,
      orderBy: Seq[String],
      partitionBy: Option[String] = None,
      indexes: Seq[ChIndex] = Nil,
      unsigned: Set[String] = Set.empty,
      typeOverrides: Map[String, String] = Map.empty)

  /** ClickHouse reserved words the reference backtick-quotes in DDL
    * (erc20's `from`/`to` columns). Kept to the set that actually
    * collides — ClickHouse accepts most SQL keywords as bare column
    * names. */
  private val reserved = Set("from", "to", "order", "select", "where",
    "group", "limit", "join", "using", "array", "index", "primary", "key")

  def quote(id: String): String =
    if (reserved(id.toLowerCase)) s"`$id`" else id

  /** Spark → ClickHouse type. `unsigned` flips integer families to their
    * UInt twins (Spark reads the reference's UInt64 block numbers as
    * signed longs; the sink must declare the original domain). */
  def chType(dt: DataType, unsigned: Boolean = false,
      nullable: Boolean = false): String = {
    val base = dt match {
      case ByteType => if (unsigned) "UInt8" else "Int8"
      case ShortType => if (unsigned) "UInt16" else "Int16"
      case IntegerType => if (unsigned) "UInt32" else "Int32"
      case LongType => if (unsigned) "UInt64" else "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "String"
      case BooleanType => "Boolean"
      // reference pipelines hex/base58-encode binaries before the sink
      // (erc20 hashes, svm addresses) — the CH column is String
      case BinaryType => "String"
      case DateType => "Date32"
      case TimestampType => "DateTime64(6)"
      case d: DecimalType =>
        val s = d.scale
        if (d.precision <= 9) s"Decimal32($s)"
        else if (d.precision <= 18) s"Decimal64($s)"
        else if (d.precision <= 38) s"Decimal128($s)"
        else s"Decimal256($s)"
      case ArrayType(e, containsNull) =>
        s"Array(${chType(e, unsigned, containsNull)})"
      case other =>
        throw new IllegalArgumentException(s"no ClickHouse mapping: $other")
    }
    // MergeTree key columns must not be Nullable; callers pass
    // nullable=false for orderBy/partition columns
    if (nullable) s"Nullable($base)" else base
  }

  /** The (column, ClickHouse type) contract a wire client needs to
    * encode rows for table `t` — the same resolution [[createTable]]
    * renders, exposed so the k27 HTTP sink encodes with EXACTLY the
    * types the DDL declared (one source of truth, no drift). */
  def columnTypes(t: ChTable, schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.map(f => f.name -> colType(t, f))

  private def colType(t: ChTable, f: StructField): String =
    t.typeOverrides.getOrElse(f.name, {
      val keyCol = t.orderBy.contains(f.name) ||
        t.partitionBy.contains(f.name)
      chType(f.dataType, t.unsigned(f.name), f.nullable && !keyCol)
    })

  private def orderByClause(cols: Seq[String]): String =
    if (cols.size == 1) quote(cols.head)
    else cols.map(quote).mkString("(", ", ", ")")

  /** MergeTree CREATE TABLE in the reference's exact layout
    * (erc20_transfers.py:32-51): 4-space-indented column list, inline
    * INDEX entries, ENGINE/PARTITION BY/ORDER BY trailer. */
  def createTable(t: ChTable, schema: StructType): String = {
    val cols = schema.fields.map(f => s"    ${quote(f.name)} ${colType(t, f)}")
    val idx = t.indexes.map(i => s"    ${i.ddl}")
    val partition = t.partitionBy.map(p => s"\nPARTITION BY ${quote(p)}")
      .getOrElse("")
    s"""CREATE TABLE IF NOT EXISTS ${t.name} (
       |${(cols ++ idx).mkString(",\n")}
       |) ENGINE = MergeTree$partition
       |ORDER BY ${orderByClause(t.orderBy)};""".stripMargin
  }

  /** The EmbeddedRocksDB + DICTIONARY pair of db.py:48-77 — the
    * reference's point-lookup dictionary (token_decimals.py:25-34; the
    * k05 static-dict twin). Returns (table DDL, dictionary DDL). */
  def createDict(name: String, schema: StructType, primaryKey: String,
      unsigned: Set[String] = Set.empty): (String, String) = {
    val fields = schema.fields
      .map(f => s"    ${quote(f.name)} ${chType(f.dataType, unsigned(f.name))}")
      .mkString(",\n")
    val table =
      s"""CREATE TABLE IF NOT EXISTS ${name}_table (
         |$fields,
         |    PRIMARY KEY $primaryKey
         |) ENGINE = EmbeddedRocksDB()
         |SETTINGS optimize_for_bulk_insert=0;""".stripMargin
    val dict =
      s"""CREATE DICTIONARY IF NOT EXISTS $name (
         |$fields
         |) PRIMARY KEY $primaryKey
         |SOURCE(CLICKHOUSE(TABLE '${name}_table'))
         |LAYOUT(DIRECT());""".stripMargin
    (table, dict)
  }

  /** The ENGINE trailer alone — what Spark's JDBC writer appends after
    * its generated column list (`createTableOptions`), letting the k02
    * sink CREATE real MergeTree tables over a ClickHouse JDBC URL. */
  def engineClause(t: ChTable): String = {
    val partition = t.partitionBy.map(p => s" PARTITION BY ${quote(p)}")
      .getOrElse("")
    s"ENGINE = MergeTree$partition ORDER BY ${orderByClause(t.orderBy)}"
  }

  /** Canonical token form for golden comparison: backticks and layout
    * whitespace are presentation, the (column, type, index, engine,
    * key) content is the contract. */
  def canonical(ddl: String): String = {
    val noTicks = ddl.replace("`", "").replaceAll("\\s+", " ").trim
      .stripSuffix(";")
    // single-column ORDER BY prints both bare (erc20_transfers.py:49)
    // and parenthesized (orca_metadata.py:143) in the reference
    noTicks.replaceAll("ORDER BY \\(([A-Za-z0-9_]+)\\)", "ORDER BY $1")
  }

  // ---------------------------------------------------------------------
  // The six reference sink tables + the dict pair, spec'd from this
  // module's own contract types. Schemas are written out (not read from
  // parquet) because they ARE the reference's declared column contracts.
  // ---------------------------------------------------------------------

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  /** erc20_transfers.py:32-51 */
  private[graft] val erc20Table = ChTable(
    name = "erc20_transfers",
    orderBy = Seq("block_number"),
    partitionBy = Some("chain_id"),
    indexes = Seq(
      MinMaxIndex("ts_idx", "timestamp"),
      BloomIndex("from_idx", "from"),
      BloomIndex("to_idx", "to")),
    unsigned = Set("block_number", "transaction_index", "log_index",
      "chain_id"),
    // u256 token amount: 78 decimal digits — wider than Spark's max
    // precision 38, so the sink column is pinned
    typeOverrides = Map("amount" -> "Decimal256(0)"))

  private[graft] val erc20Schema = st(
    "block_number" -> LongType, "block_hash" -> StringType,
    "transaction_index" -> LongType, "log_index" -> LongType,
    "transaction_hash" -> StringType, "address" -> StringType,
    "from" -> StringType, "to" -> StringType,
    "amount" -> DecimalType(38, 0), "timestamp" -> LongType,
    "chain_id" -> LongType)

  /** swap_prices.py:29-41 */
  private[graft] val swapPricesTable = ChTable(
    name = "swap_prices",
    orderBy = Seq("mint", "block_slot"),
    indexes = Seq(MinMaxIndex("ts_idx", "timestamp")),
    unsigned = Set("block_slot"))

  private[graft] val swapPricesSchema = st(
    "block_slot" -> LongType, "mint" -> StringType,
    "price" -> DecimalType(38, 9), "timestamp" -> LongType,
    "window_total_amount" -> DecimalType(38, 9))

  /** orca_metadata.py:105-143 (whirlpool pool-init metadata) */
  private[graft] val orcaMetadataTable = ChTable(
    name = "orca_metadata",
    orderBy = Seq("whirlpool"),
    indexes = Seq(MinMaxIndex("ts_idx", "timestamp"),
      MinMaxIndex("height_idx", "block_height"),
      MinMaxIndex("block_slot_idx", "block_slot"),
      BloomIndex("token_mint_a_idx", "token_mint_a"),
      BloomIndex("token_mint_b_idx", "token_mint_b")),
    unsigned = Set("block_slot", "transaction_index", "block_height",
      "instruction_address", "version", "whirlpool_bump", "tick_spacing"))

  private[graft] val orcaMetadataSchema = st(
    "block_slot" -> LongType, "block_hash" -> StringType,
    "transaction_index" -> LongType, "transaction_signature" -> StringType,
    "instruction_address" -> ArrayType(IntegerType, containsNull = false),
    "program_id" -> StringType,
    "timestamp" -> LongType, "block_height" -> LongType,
    "version" -> ByteType,
    "whirlpools_config" -> StringType,
    "token_mint_a" -> StringType, "token_mint_b" -> StringType,
    "token_badge_a" -> StringType, "token_badge_b" -> StringType,
    "funder" -> StringType, "whirlpool" -> StringType,
    "token_vault_a" -> StringType, "token_vault_b" -> StringType,
    "fee_tier" -> StringType,
    "token_program_a" -> StringType, "token_program_b" -> StringType,
    "system_program" -> StringType, "rent" -> StringType,
    "whirlpool_bump" -> ByteType, "tick_spacing" -> ShortType,
    "initial_sqrt_price" -> DecimalType(38, 0))

  /** token_decimals.py:25-34 via db.py:48-77 */
  private[graft] val tokenDecimalsSchema = st(
    "mint" -> StringType, "decimals" -> ShortType)

  /** k23 — DDL generation as a gated query: one row per generated
    * statement, oracled against the reference's LITERAL DDL (typed into
    * the VALUES oracle from the cited file:line, canonicalized) — a
    * golden test the driver's DuckDB compare enforces every round. */
  def k23ClickhouseDdl(spark: SparkSession, dir: String): DataFrame = {
    val (dictTable, dictDict) =
      createDict("token_decimals", tokenDecimalsSchema, "mint",
        unsigned = Set("decimals"))
    val rows = Seq(
      ("erc20_transfers", canonical(createTable(erc20Table, erc20Schema))),
      ("swap_prices",
        canonical(createTable(swapPricesTable, swapPricesSchema))),
      ("orca_metadata",
        canonical(createTable(orcaMetadataTable, orcaMetadataSchema))),
      ("token_decimals_table", canonical(dictTable)),
      ("token_decimals_dict", canonical(dictDict)))
    import spark.implicits._
    rows.toDF("object_name", "ddl").orderBy(col("object_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("k23_clickhouse_ddl" -> (k23ClickhouseDdl _))

  /** The oracle side IS the reference DDL: each string below is the
    * literal statement from the cited reference line, canonicalized by
    * the same rules as [[canonical]] (whitespace collapsed, backticks
    * dropped, single-column ORDER BY parens stripped) — so the gate
    * fails if generator output drifts from the reference's contract. */
  val oracle: Map[String, String] = Map(
    "k23_clickhouse_ddl" ->
      """SELECT * FROM (VALUES
        |  ('erc20_transfers', 'CREATE TABLE IF NOT EXISTS erc20_transfers ( block_number UInt64, block_hash String, transaction_index UInt64, log_index UInt64, transaction_hash String, address String, from String, to String, amount Decimal256(0), timestamp Int64, chain_id UInt64, INDEX ts_idx timestamp TYPE minmax GRANULARITY 4, INDEX from_idx from TYPE bloom_filter(0.01) GRANULARITY 4, INDEX to_idx to TYPE bloom_filter(0.01) GRANULARITY 4 ) ENGINE = MergeTree PARTITION BY chain_id ORDER BY block_number'),
        |  ('swap_prices', 'CREATE TABLE IF NOT EXISTS swap_prices ( block_slot UInt64, mint String, price Decimal128(9), timestamp Int64, window_total_amount Decimal128(9), INDEX ts_idx timestamp TYPE minmax GRANULARITY 4 ) ENGINE = MergeTree ORDER BY (mint, block_slot)'),
        |  ('orca_metadata', 'CREATE TABLE IF NOT EXISTS orca_metadata ( block_slot UInt64, block_hash String, transaction_index UInt64, transaction_signature String, instruction_address Array(UInt32), program_id String, timestamp Int64, block_height UInt64, version UInt8, whirlpools_config String, token_mint_a String, token_mint_b String, token_badge_a String, token_badge_b String, funder String, whirlpool String, token_vault_a String, token_vault_b String, fee_tier String, token_program_a String, token_program_b String, system_program String, rent String, whirlpool_bump UInt8, tick_spacing UInt16, initial_sqrt_price Decimal128(0), INDEX ts_idx timestamp TYPE minmax GRANULARITY 4, INDEX height_idx block_height TYPE minmax GRANULARITY 4, INDEX block_slot_idx block_slot TYPE minmax GRANULARITY 4, INDEX token_mint_a_idx token_mint_a TYPE bloom_filter(0.01) GRANULARITY 4, INDEX token_mint_b_idx token_mint_b TYPE bloom_filter(0.01) GRANULARITY 4 ) ENGINE = MergeTree ORDER BY whirlpool'),
        |  ('token_decimals_table', 'CREATE TABLE IF NOT EXISTS token_decimals_table ( mint String, decimals UInt16, PRIMARY KEY mint ) ENGINE = EmbeddedRocksDB() SETTINGS optimize_for_bulk_insert=0'),
        |  ('token_decimals_dict', 'CREATE DICTIONARY IF NOT EXISTS token_decimals ( mint String, decimals UInt16 ) PRIMARY KEY mint SOURCE(CLICKHOUSE(TABLE ''token_decimals_table'')) LAYOUT(DIRECT())')
        |) AS t(object_name, ddl) ORDER BY object_name""".stripMargin)
}
