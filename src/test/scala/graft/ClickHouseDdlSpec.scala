package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ClickHouseDdl
import graft.sinks.ClickHouseDdl._
import graft.sinks.Writers.JdbcSink

/** Golden tests: the DDL generator must reproduce the reference's
  * literal ClickHouse DDL. The expected strings below are DATA — the
  * reference's declared sink contracts (cited file:line), the same
  * necessarily-mirrored-constants category as ChainDict — canonicalized
  * by ClickHouseDdl.canonical (whitespace/backtick/single-col-parens
  * presentation dropped, every (column, type, index, engine, key) token
  * kept). */
class ClickHouseDdlSpec extends AnyFunSuite {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) =>
      StructField(n, t, nullable = false)
    })

  // --- erc20_transfers.py:32-51 ---------------------------------------
  test("erc20_transfers: generated DDL == reference DDL (canonical)") {
    val expected = canonical("""CREATE TABLE IF NOT EXISTS erc20_transfers (
    block_number UInt64,
    block_hash String,
    transaction_index UInt64,
    log_index UInt64,
    transaction_hash String,
    address String,
    `from` String,
    `to` String,
    amount Decimal256(0),
    timestamp Int64,
    chain_id UInt64,
    INDEX ts_idx timestamp TYPE minmax GRANULARITY 4,
    INDEX from_idx `from` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX to_idx `to` TYPE bloom_filter(0.01) GRANULARITY 4
) ENGINE = MergeTree
PARTITION BY chain_id
ORDER BY block_number;""")
    assert(canonical(createTable(erc20Table, erc20Schema)) === expected)
  }

  test("erc20: reserved columns from/to are backtick-quoted in raw DDL") {
    val raw = createTable(erc20Table, erc20Schema)
    assert(raw.contains("    `from` String,"), raw)
    assert(raw.contains("INDEX from_idx `from` TYPE bloom_filter(0.01)"), raw)
  }

  // --- meteora_swaps.py:135-186 ---------------------------------------
  test("meteora_swaps: generated DDL == reference DDL (canonical)") {
    val table = ChTable(
      name = "meteora_swaps",
      orderBy = Seq("block_slot", "transaction_index",
        "instruction_address"),
      indexes = Seq(
        MinMaxIndex("ts_idx", "timestamp"),
        MinMaxIndex("height_idx", "block_height"),
        BloomIndex("input_token_account_idx", "input_token_account"),
        BloomIndex("output_token_account_idx", "output_token_account"),
        BloomIndex("pool_idx", "pool"),
        BloomIndex("input_mint_idx", "input_mint"),
        BloomIndex("output_mint_idx", "output_mint"),
        BloomIndex("input_vault_idx", "input_vault"),
        BloomIndex("output_vault_idx", "output_vault"),
        BloomIndex("payer_idx", "payer")),
      unsigned = Set("block_slot", "transaction_index",
        "instruction_address", "amount_in", "minimum_amount_out",
        "output_amount", "lp_fee", "protocol_fee", "partner_fee",
        "referral_fee", "input_amount", "current_timestamp",
        "block_height"))
    val schema = st(
      "block_slot" -> LongType, "block_hash" -> StringType,
      "transaction_index" -> LongType,
      "transaction_signature" -> StringType,
      "instruction_address" -> ArrayType(IntegerType, containsNull = false),
      "program_id" -> StringType,
      "pool" -> StringType, "b_to_a" -> BooleanType,
      "has_referral" -> BooleanType, "amount_in" -> LongType,
      "minimum_amount_out" -> LongType, "output_amount" -> LongType,
      "next_sqrt_price" -> DecimalType(38, 0), "lp_fee" -> LongType,
      "protocol_fee" -> LongType, "partner_fee" -> LongType,
      "referral_fee" -> LongType, "input_amount" -> LongType,
      "current_timestamp" -> LongType, "found_cpi" -> BooleanType,
      "pool_authority" -> StringType,
      "input_token_account" -> StringType,
      "output_token_account" -> StringType,
      "input_vault" -> StringType, "output_vault" -> StringType,
      "input_mint" -> StringType, "output_mint" -> StringType,
      "payer" -> StringType, "input_token_program" -> StringType,
      "output_token_program" -> StringType,
      "referral_token_account" -> StringType,
      "timestamp" -> LongType, "block_height" -> LongType)
    val expected = canonical("""CREATE TABLE IF NOT EXISTS meteora_swaps (
    block_slot UInt64,
    block_hash String,
    transaction_index UInt64,
    transaction_signature String,
    instruction_address Array(UInt32),
    program_id String,
    pool String,
    b_to_a Boolean,
    has_referral Boolean,
    amount_in UInt64,
    minimum_amount_out UInt64,
    output_amount UInt64,
    next_sqrt_price Decimal128(0),
    lp_fee UInt64,
    protocol_fee UInt64,
    partner_fee UInt64,
    referral_fee UInt64,
    input_amount UInt64,
    current_timestamp UInt64,
    found_cpi Boolean,
    pool_authority String,
    input_token_account String,
    output_token_account String,
    input_vault String,
    output_vault String,
    input_mint String,
    output_mint String,
    payer String,
    input_token_program String,
    output_token_program String,
    referral_token_account String,
    timestamp Int64,
    block_height UInt64,
    INDEX ts_idx timestamp TYPE minmax GRANULARITY 4,
    INDEX height_idx block_height TYPE minmax GRANULARITY 4,
    INDEX input_token_account_idx `input_token_account` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX output_token_account_idx `output_token_account` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX pool_idx `pool` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX input_mint_idx `input_mint` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX output_mint_idx `output_mint` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX input_vault_idx `input_vault` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX output_vault_idx `output_vault` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX payer_idx `payer` TYPE bloom_filter(0.01) GRANULARITY 4
) ENGINE = MergeTree
ORDER BY (block_slot, transaction_index, instruction_address);""")
    assert(canonical(createTable(table, schema)) === expected)
  }

  // --- orca_swaps.py:180-219 ------------------------------------------
  test("orca_swaps: generated DDL == reference DDL (canonical)") {
    val table = ChTable(
      name = "orca_swaps",
      orderBy = Seq("block_slot", "transaction_index",
        "instruction_address"),
      indexes = Seq(
        MinMaxIndex("ts_idx", "timestamp"),
        MinMaxIndex("height_idx", "block_height"),
        BloomIndex("input_token_account_idx", "input_token_account"),
        BloomIndex("output_token_account_idx", "output_token_account"),
        // the reference's own index name typo, reproduced: the name is
        // part of the DDL contract (orca_swaps.py:214)
        BloomIndex("wirlpool_idx", "whirlpool"),
        BloomIndex("input_mint_idx", "input_mint"),
        BloomIndex("output_mint_idx", "output_mint"),
        BloomIndex("input_vault_idx", "input_vault"),
        BloomIndex("output_vault_idx", "output_vault")),
      unsigned = Set("block_slot", "transaction_index",
        "instruction_address", "input_amount", "output_amount", "amount",
        "other_amount_threshold", "block_height", "version"))
    val schema = st(
      "block_slot" -> LongType, "block_hash" -> StringType,
      "transaction_index" -> LongType,
      "transaction_signature" -> StringType,
      "instruction_address" -> ArrayType(IntegerType, containsNull = false),
      "program_id" -> StringType, "token_authority" -> StringType,
      "whirlpool" -> StringType, "input_token_account" -> StringType,
      "output_token_account" -> StringType, "input_mint" -> StringType,
      "input_vault" -> StringType, "input_amount" -> LongType,
      "output_mint" -> StringType, "output_vault" -> StringType,
      "output_amount" -> LongType, "amount" -> LongType,
      "amount_specified_is_input" -> BooleanType,
      "other_amount_threshold" -> LongType,
      "sqrt_price_limit" -> DecimalType(38, 0),
      "timestamp" -> LongType, "block_height" -> LongType,
      "version" -> ByteType, "a_to_b" -> BooleanType,
      "found_input" -> BooleanType, "found_output" -> BooleanType)
    val expected = canonical("""CREATE TABLE IF NOT EXISTS orca_swaps (
    block_slot UInt64,
    block_hash String,
    transaction_index UInt64,
    transaction_signature String,
    instruction_address Array(UInt32),
    program_id String,
    token_authority String,
    whirlpool String,
    input_token_account String,
    output_token_account String,
    input_mint String,
    input_vault String,
    input_amount UInt64,
    output_mint String,
    output_vault String,
    output_amount UInt64,
    amount UInt64,
    amount_specified_is_input Boolean,
    other_amount_threshold UInt64,
    sqrt_price_limit Decimal128(0),
    timestamp Int64,
    block_height UInt64,
    version UInt8,
    a_to_b Boolean,
    found_input Boolean,
    found_output Boolean,
    INDEX ts_idx timestamp TYPE minmax GRANULARITY 4,
    INDEX height_idx block_height TYPE minmax GRANULARITY 4,
    INDEX input_token_account_idx `input_token_account` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX output_token_account_idx `output_token_account` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX wirlpool_idx `whirlpool` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX input_mint_idx `input_mint` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX output_mint_idx `output_mint` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX input_vault_idx `input_vault` TYPE bloom_filter(0.01) GRANULARITY 4,
    INDEX output_vault_idx `output_vault` TYPE bloom_filter(0.01) GRANULARITY 4
) ENGINE = MergeTree
ORDER BY (block_slot, transaction_index, instruction_address);""")
    assert(canonical(createTable(table, schema)) === expected)
  }

  // --- db.py:48-77 / token_decimals.py:25-34 --------------------------
  test("token_decimals dict pair == reference create_dict DDL") {
    val (tbl, dict) = createDict("token_decimals",
      st("mint" -> StringType, "decimals" -> ShortType), "mint",
      unsigned = Set("decimals"))
    assert(canonical(tbl) === canonical("""CREATE TABLE IF NOT EXISTS token_decimals_table (
        mint String,
        decimals UInt16,
        PRIMARY KEY mint
    ) ENGINE = EmbeddedRocksDB()
    SETTINGS optimize_for_bulk_insert=0;"""))
    assert(canonical(dict) === canonical("""CREATE DICTIONARY IF NOT EXISTS token_decimals (
        mint String,
        decimals UInt16
    ) PRIMARY KEY mint
    SOURCE(CLICKHOUSE(TABLE 'token_decimals_table'))
    LAYOUT(DIRECT());"""))
  }

  // --- type mapping ----------------------------------------------------
  test("type ladder: decimal precision picks the narrowest CH decimal") {
    assert(chType(DecimalType(9, 2)) === "Decimal32(2)")
    assert(chType(DecimalType(18, 0)) === "Decimal64(0)")
    assert(chType(DecimalType(38, 9)) === "Decimal128(9)")
    assert(chType(DecimalType(38, 0)) === "Decimal128(0)")
  }

  test("type mapping: unsigned hint, arrays, temporals, nullability") {
    assert(chType(LongType, unsigned = true) === "UInt64")
    assert(chType(ArrayType(IntegerType, containsNull = false),
      unsigned = true) === "Array(UInt32)")
    assert(chType(ArrayType(IntegerType), unsigned = true) ===
      "Array(Nullable(UInt32))")
    assert(chType(TimestampType) === "DateTime64(6)")
    assert(chType(DateType) === "Date32")
    assert(chType(StringType, nullable = true) === "Nullable(String)")
    assert(chType(BinaryType) === "String")
  }

  test("orderBy/partition key columns are never Nullable") {
    val t = ChTable("x", orderBy = Seq("k"), partitionBy = Some("p"))
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("p", IntegerType, nullable = true),
      StructField("v", StringType, nullable = true)))
    val ddl = createTable(t, schema)
    assert(ddl.contains("    k Int64,"), ddl)
    assert(ddl.contains("    p Int32,"), ddl)
    assert(ddl.contains("    v Nullable(String)"), ddl)
  }

  // --- JDBC dialect wiring ---------------------------------------------
  test("ClickHouse-URL JdbcSink carries MergeTree createTableOptions " +
    "and registers the dialect") {
    val sink = JdbcSink("jdbc:clickhouse://localhost:8123/default",
      "erc20_transfers", clickhouse = Some(erc20Table))
    assert(sink.options("createTableOptions") ===
      "ENGINE = MergeTree PARTITION BY chain_id ORDER BY block_number")
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects
      .get("jdbc:clickhouse://localhost:8123/default")
    assert(dialect.getJDBCType(DecimalType(38, 9))
      .map(_.databaseTypeDefinition) === Some("Decimal128(9)"))
    assert(dialect.quoteIdentifier("from") === "`from`")
    // a Derby URL must NOT hit the ClickHouse dialect
    val derby = org.apache.spark.sql.jdbc.JdbcDialects
      .get("jdbc:derby:memory:x")
    assert(derby.getJDBCType(DecimalType(38, 9))
      .forall(_.databaseTypeDefinition != "Decimal128(9)"))
  }

  test("engineClause without partition omits the PARTITION BY clause") {
    assert(ClickHouseDdl.engineClause(swapPricesTable) ===
      "ENGINE = MergeTree ORDER BY (mint, block_slot)")
  }
}
