package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{base58_decode, base58_encode, keccak256, u256_from_long, u256_sum, u256_to_decimal}
import graft.sources.Tables

/** Domain-function queries f01–f05 (SURVEY.md §2): cherry-core's byte-level
  * helpers re-expressed as codegen'd Catalyst expressions and exercised over
  * the documents table.
  *
  * Oracle strategy: where DuckDB has the same primitive (hex, sha256) the
  * oracle recomputes it; where it doesn't (keccak, base58, u256) the query
  * round-trips encode∘decode so the oracle is the identity projection — a
  * wrong implementation breaks the hash compare, and known-vector unit
  * specs (FunctionsSpec) pin the absolute outputs.
  */
object DomainFunctions {

  /** f01 — binary↔hex (cherry HexEncode cast step). */
  def f01HexEncode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
      .orderBy(col("doc_id"))

  /** f02 — anchor discriminator: first 8 bytes of sha256("global:"+name)
    * (svm_anchor_discriminator, orca_swaps.py:47,83). */
  def f02Discriminator(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("source")).distinct()
      .select(col("source"),
        substring(sha2(concat(lit("global:"), col("source")), 256), 1, 16)
          .as("disc"))
      .orderBy(col("source"))

  /** The canonical public EVM event signatures and their topic0 hashes
    * (ERC-20 Transfer/Approval, ERC-721 ApprovalForAll, WETH
    * Deposit/Withdrawal) — fixed public constants, usable as a VALUES
    * oracle: DuckDB can't run keccak, but it can assert our keccak
    * reproduces the universally-known digests. */
  private[graft] val topic0Vectors: Seq[(String, String)] = Seq(
    "Transfer(address,address,uint256)" ->
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef",
    "Approval(address,address,uint256)" ->
      "8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925",
    "ApprovalForAll(address,address,bool)" ->
      "17307eab39ab6107e8899845ad3d59bd9653f200f220920489ca2b5937696c31",
    "Deposit(address,uint256)" ->
      "e1fffcc4923d04b559f4d29a8bfc6cda04eb5b0d3c460751c2402c5c5cc9109c",
    "Withdrawal(address,uint256)" ->
      "7fcf532c15f0a6db0bd6d0e038bea71d30d808c7d98cb3bf7268a95bf5081b65")

  /** f03 — keccak-256 event-signature topic0 (erc20_transfers.py:94,
    * evm_signature_to_topic0). The query runs the distributed keccak
    * expression over the canonical public signature set; the DuckDB
    * oracle is those signatures' KNOWN topic0 digests as a VALUES table
    * — cross-engine drift in the keccak implementation fails the
    * per-round gate, not just the unit spec. */
  def f03KeccakTopic0(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    topic0Vectors.map(_._1).toDF("signature")
      .select(col("signature"),
        lower(hex(keccak256(col("signature").cast("binary")))).as("topic0"))
      .orderBy(col("signature"))
  }

  /** f04 — base58 encode∘decode round trip (base58_decode_string,
    * orca_swaps.py:235-260). Operates on a 32-byte digest — the same width
    * as the Solana pubkeys the reference encodes; base conversion is
    * O(bytes²), so whole-document inputs would be quadratic for no
    * fidelity gain. Oracle = sha256 identity on the other side of the
    * round trip. */
  def f04Base58Roundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        lower(hex(base58_decode(base58_encode(
          unhex(sha2(col("text").cast("binary"), 256)))))).as("h"))
      .orderBy(col("doc_id"))

  /** f05 — u256 32-byte BE binary codec round trip (erc20 amount
    * Decimal256 decode). The final amount is emitted as a canonical
    * decimal string — the engine-portable representation for values that
    * may exceed every native numeric width. Oracle = the same arithmetic
    * on the source longs, cast to VARCHAR. */
  def f05U256Roundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        u256_to_decimal(
          u256_from_long(col("doc_id") * lit(1000000L) + col("n_chars")))
          .cast("string").as("amount"))
      .orderBy(col("doc_id"))

  /** f06 — exact 256-bit SUM per group (ClickHouse sums ERC-20 amounts as
    * Decimal256/UInt256 — beyond Spark's 38-digit DecimalType, hence the
    * custom TypedImperativeAggregate). Values here fit 38 digits so the
    * DuckDB decimal oracle can verify; FunctionsSpec pins the >38-digit
    * and 2^256-wraparound behavior the oracle can't reach.
    */
  def f06U256Sum(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(col("source"))
      .agg(u256_to_decimal(
        u256_sum(u256_from_long(col("doc_id") * lit(1000000L) + col("n_chars"))))
        .cast("string").as("amount"))
      .orderBy(col("source"))

  /** f07 — Decimal256-style mul/div/ratio arithmetic (swap_prices.py:
    * 203-217 computes price = amount_a/amount_b in Decimal(38,9);
    * ClickHouse stores Decimal256). The operands are lifted into the u256
    * binary domain, multiplied / integer-divided / ratio'd at scale 9
    * exactly (no double rounding anywhere), and surfaced as canonical
    * strings. The oracle recomputes the same integer arithmetic in SQL;
    * FunctionsSpec pins >38-digit products and the 2^256 wraparound the
    * oracle can't reach.
    */
  def f07U256Ratio(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{u256_mul, u256_div, u256_ratio_decimal}
    // part-sorted scan, u256 kernels projected after: the BigInteger math
    // is row-local, so the query needs NO shuffle — a global orderBy's
    // range exchange would add a sampling scan plus a full-fact shuffle
    // for ordering the comparator doesn't need
    val t = Tables(spark, dir).lineitem
      .filter(col("l_quantity") > lit(0.0))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
    val a = u256_from_long(floor(col("l_extendedprice") * 100).cast("long"))
    val b = u256_from_long(floor(col("l_quantity")).cast("long"))
    t.select(col("l_orderkey"), col("l_linenumber"),
        u256_to_decimal(u256_mul(a, b)).cast("string").as("product"),
        u256_to_decimal(u256_div(a, b)).cast("string").as("quotient"),
        u256_ratio_decimal(a, b, 9).cast("string").as("price"))
  }

  /** f08 — SIGNED 256-bit codec round trip (int256 event params, e.g.
    * Uniswap-V3 Swap amounts): sign-extended encode, two's-complement
    * decode, canonical signed decimal strings across the negative/
    * positive boundary. */
  def f08S256Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{s256_from_long, s256_to_decimal}
    Tables(spark, dir).documents
      .select(col("doc_id"),
        s256_to_decimal(s256_from_long(
          (col("doc_id") - 250) * lit(1000000L) + col("n_chars")))
          .cast("string").as("amount"))
      .orderBy(col("doc_id"))
  }

  /** EIP-55 checksum encoding of a 40-char lowercase hex address: a hex
    * LETTER uppercases exactly when the corresponding nibble of
    * keccak256(ascii(lowercase_address)) is ≥ 8. Pure Columns over the
    * keccak expression — per-character via one transform over a constant
    * 40-step sequence, no UDF. */
  private[graft] def eip55(addr40: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val h = lower(hex(keccak256(addr40.cast("binary"))))
    concat_ws("", transform(sequence(lit(0), lit(39)), i => {
      val c = addr40.substr(i + 1, lit(1))
      val nibble = conv(h.substr(i + 1, lit(1)), 16, 10).cast("int")
      when(c.rlike("[a-f]") && nibble >= 8, upper(c)).otherwise(c)
    }))
  }

  /** The EIP-55 specification's own test vectors (all-caps, all-lower,
    * and normal checksum cases) — public constants fit for a VALUES
    * oracle. */
  private[graft] val eip55Vectors: Seq[String] = Seq(
    "0x52908400098527886E0F7030069857D2E4169EE7",
    "0x8617E340B3D01FA5F11F306F4090FD50E238070D",
    "0xde709f2102306220921060314715629080e2fb77",
    "0x27b1fdb04752bbc536007a920d24acb045561c26",
    "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed",
    "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359",
    "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB",
    "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb")

  /** f09 — EIP-55 checksummed addresses (the display/API form every EVM
    * tool round-trips; the reference's hex address columns are one
    * `checksum()` away from user-facing). The distributed checksum
    * expression re-derives the EIP's own test vectors from their
    * lowercased forms; the oracle is the spec's literal expected output
    * — keccak drift fails the driver gate. */
  def f09Eip55Checksum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    eip55Vectors.toDF("addr_expected")
      .select(lower(substring(col("addr_expected"), 3, 40))
        .as("addr_lower"))
      .select(col("addr_lower"),
        concat(lit("0x"), eip55(col("addr_lower")))
          .as("addr_checksummed"))
      .orderBy(col("addr_lower"))
  }

  /** f10 — function-CALLDATA decode (the tx-input twin of the event
    * decoder; reference users decode both through the same ABI config).
    * transfer(address,uint256) calldata synthesized at the binary level
    * (4-byte selector ++ address word ++ amount word); every 7th row is
    * truncated mid-word and every 11th carries a foreign selector — both
    * must null their decoded columns under allow_decode_fail while the
    * row itself survives (the erc20_transfers.py:131-141 contract).
    */
  def f10CalldataDecode(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{u256_from_long, EvmAbi}
    val sig = "transfer(address dst, uint256 amount)"
    def pack(selHex: String) = concat(unhex(lit(selHex)),
      u256_from_long(col("l_partkey")),
      u256_from_long(floor(col("l_extendedprice") * 100).cast("long")))
    val calldata =
      when(pmod(col("l_orderkey"), lit(7)) === 0, substring(pack(EvmAbi.selectorHex(sig)), 1, 40))
        .when(pmod(col("l_orderkey"), lit(11)) === 0, pack("deadbeef"))
        .otherwise(pack(EvmAbi.selectorHex(sig)))
    EvmAbi.decodeFunction(
        Tables(spark, dir).lineitem.filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"), calldata.as("input")),
        sig)
      .select(col("l_orderkey"), col("dst"),
        col("amount").cast("string").as("amount"))
      .orderBy(col("l_orderkey"))
  }

  /** f11 — Solana compact-u16 (ShortVec) codec: the variable-length
    * prefix on every message-level vector (accounts, instructions,
    * signatures), which the fixed-offset Borsh readers cannot express.
    * Each event synthesizes `shortvec(len) ++ le64(event_id)`; the
    * decode recovers the length, the PREFIX WIDTH (1–3 bytes), and the
    * field BEHIND the variable-width prefix (dynamic offset via
    * substr(width+1)). Every 17th row carries a truncated prefix
    * (a dangling continuation byte) and must null out, not throw —
    * allow_decode_fail at the message layer. The oracle recomputes
    * everything arithmetically: agreement proves encode∘decode is the
    * identity across the 1-, 2- and 3-byte prefix regimes.
    */
  def f11Shortvec(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{le_long, shortvec_from_long, shortvec_value, shortvec_width}
    val n = pmod(col("event_id") * 131, lit(20000))
    val payload = when(pmod(col("event_id"), lit(17)) === 0,
        lit(Array[Byte](0x80.toByte))) // truncated: continuation into EOF
      .otherwise(concat(shortvec_from_long(n),
        graft.functions.le_from_long(col("event_id"), 8)))
    val w = shortvec_width(col("p"), 0)
    Tables(spark, dir).events
      .select(col("event_id"), payload.as("p"))
      .select(col("event_id"),
        shortvec_value(col("p"), 0).as("len"),
        w.as("pfx_w"),
        le_long(col("p").substr(w + lit(1), lit(8)), 0, 8).as("tail_id"))
      .orderBy(col("event_id"))
  }

  val oracle: Map[String, String] = Map(
    // f03/f09: the VALUES tables are the public known-answer vectors the
    // queries re-derive with the distributed keccak — generated from the
    // same Scala constants so oracle and engine cannot drift
    "f03_keccak_topic0" ->
      topic0Vectors.sortBy(_._1)
        .map { case (s, t) => s"  ('$s', '$t')" }
        .mkString("SELECT * FROM (VALUES\n", ",\n",
          "\n) AS t(signature, topic0) ORDER BY signature"),
    "f09_eip55_checksum" ->
      eip55Vectors.map(a => s"  ('$a')")
        .mkString(
          "SELECT lower(substr(a, 3, 40)) AS addr_lower, " +
            "a AS addr_checksummed FROM (VALUES\n", ",\n",
          "\n) AS t(a) ORDER BY addr_lower"),
    // f11: decode of the synthesized payload must recover the arithmetic
    // the encode side started from, across all three prefix widths
    "f11_shortvec" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 17 = 0 THEN NULL
        |       ELSE (event_id * 131) % 20000 END AS len,
        |  CASE WHEN event_id % 17 = 0 THEN NULL
        |       WHEN (event_id * 131) % 20000 < 128 THEN 1
        |       WHEN (event_id * 131) % 20000 < 16384 THEN 2
        |       ELSE 3 END AS pfx_w,
        |  CASE WHEN event_id % 17 = 0 THEN NULL
        |       ELSE event_id END AS tail_id
        |FROM events ORDER BY event_id""".stripMargin,
    "f10_calldata_decode" ->
      """SELECT l_orderkey,
        |  CASE WHEN l_orderkey % 7 != 0 AND l_orderkey % 11 != 0
        |    THEN printf('%040x', l_partkey) END AS dst,
        |  CASE WHEN l_orderkey % 7 != 0 AND l_orderkey % 11 != 0
        |    THEN CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |      AS VARCHAR) END AS amount
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin,
    "f08_s256_decode" ->
      """SELECT doc_id,
        |  CAST(CAST((doc_id - 250) * 1000000 + n_chars AS BIGINT)
        |    AS VARCHAR) AS amount
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f07_u256_ratio" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS a,
        |    CAST(FLOOR(l_quantity) AS BIGINT) AS b
        |  FROM lineitem WHERE l_quantity > 0.0)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(a * b AS VARCHAR) AS product,
        |  CAST(a // b AS VARCHAR) AS quotient,
        |  printf('%d.%09d', (a * 1000000000 // b) // 1000000000,
        |    (a * 1000000000 // b) % 1000000000) AS price
        |FROM src ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f06_u256_sum" ->
      """SELECT source,
        |  CAST(CAST(SUM(CAST(doc_id * 1000000 + n_chars AS DECIMAL(38,0)))
        |    AS DECIMAL(38,0)) AS VARCHAR) AS amount
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "f01_hex_encode" ->
      """SELECT doc_id, hex(text) AS hx FROM documents ORDER BY doc_id""",
    "f02_discriminator" ->
      """SELECT source, substr(sha256('global:' || source), 1, 16) AS disc
        |FROM (SELECT DISTINCT source FROM documents)
        |ORDER BY source""".stripMargin,
    "f04_base58" ->
      """SELECT doc_id, sha256(text) AS h FROM documents ORDER BY doc_id""",
    "f05_u256_decode" ->
      """SELECT doc_id,
        |  CAST(CAST(doc_id * 1000000 + n_chars AS BIGINT) AS VARCHAR) AS amount
        |FROM documents ORDER BY doc_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f01_hex_encode" -> (f01HexEncode _),
    "f02_discriminator" -> (f02Discriminator _),
    "f03_keccak_topic0" -> (f03KeccakTopic0 _),
    "f04_base58" -> (f04Base58Roundtrip _),
    "f05_u256_decode" -> (f05U256Roundtrip _),
    "f06_u256_sum" -> (f06U256Sum _),
    "f07_u256_ratio" -> (f07U256Ratio _),
    "f08_s256_decode" -> (f08S256Roundtrip _),
    "f09_eip55_checksum" -> (f09Eip55Checksum _),
    "f10_calldata_decode" -> (f10CalldataDecode _),
    "f11_shortvec" -> (f11Shortvec _)
  )
}
