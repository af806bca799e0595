package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Provider-endpoint resolution — the scripts/main.py:160-189 twin.
  *
  * The reference resolves WHERE an ingest request goes from two pure
  * inputs: the provider kind and (for EVM) the chain id —
  * HYPERSYNC chains live at `https://{chain_id}.hypersync.xyz`, SQD
  * chains at `https://portal.sqd.dev/datasets/{dataset}` with the
  * dataset name looked up in the public SQD network registry
  * (main.py:18-158 _SQD_EVM_CHAIN_NAME, from
  * https://docs.sqd.ai/subsquid-network/reference/networks/). Solana
  * always ingests from the `solana-beta` dataset (main.py:179-189),
  * and its requested from_block is CLAMPED to the dataset's own start
  * block (main.py:252-260) — the dataset doesn't reach back to genesis,
  * so an older request would stall forever waiting for blocks the
  * provider will never serve.
  *
  * Everything here is a pure function (no network): st21's typed
  * [[IngestRequest]] says WHAT to pull, this says WHERE FROM, and the
  * dataset start block — which the reference fetches from the portal's
  * metadata endpoint — is an injected input. Unknown chains and kinds
  * FAIL FAST with the offending value named (the reference's KeyError
  * made typo'd chain ids die as stack traces mid-dispatch).
  */
object Providers {

  sealed abstract class ProviderKind(val name: String)
  case object Sqd extends ProviderKind("sqd")
  case object Hypersync extends ProviderKind("hypersync")

  /** main.py:216-222 _to_provider_kind — unknown kinds fail fast. */
  def parseKind(s: String): ProviderKind = s match {
    case "sqd" => Sqd
    case "hypersync" => Hypersync
    case other => throw new IllegalArgumentException(
      s"invalid provider kind '$other', allowed: sqd, hypersync")
  }

  /** The resolved provider endpoint (ingest.ProviderConfig twin). */
  final case class ProviderConfig(kind: ProviderKind, url: String,
      bufferSize: Int)

  /** main.py:160 _DEFAULT_PROVIDER_BUFFER_SIZE. */
  val DefaultBufferSize = 2

  /** main.py:177-179: the solana-beta dataset (block_number=block_slot
    * and fresher than solana-mainnet, per the reference's own comment). */
  val SqdSvmUrl = "https://portal.sqd.dev/datasets/solana-beta"

  def makeEvmProvider(kind: ProviderKind, chainId: Long,
      bufferSize: Int = DefaultBufferSize): ProviderConfig = {
    val url = kind match {
      case Hypersync => s"https://$chainId.hypersync.xyz"
      case Sqd =>
        val dataset = sqdEvmDatasets.getOrElse(chainId,
          throw new IllegalArgumentException(
            s"chain id $chainId has no SQD dataset; known ids: " +
              s"${sqdEvmDatasets.size} chains — see docs.sqd.ai networks"))
        s"https://portal.sqd.dev/datasets/$dataset"
    }
    ProviderConfig(kind, url, bufferSize)
  }

  def makeSvmProvider(bufferSize: Int = DefaultBufferSize): ProviderConfig =
    ProviderConfig(Sqd, SqdSvmUrl, bufferSize)

  /** main.py:252-260: `from_block = max(dataset_start, from_block)` —
    * the source-side floor (k24's min-block probe is the SINK-side
    * twin). `datasetStartBlock` is what the portal metadata endpoint
    * reports; injected because resolution must stay pure. */
  def clampFromBlock(datasetStartBlock: Long, requestedFromBlock: Long): Long =
    math.max(datasetStartBlock, requestedFromBlock)

  /** k25 — endpoint resolution as a query (k05's dictGet pattern applied
    * to main.py's provider dispatch): every registered EVM chain is
    * resolved through [[makeEvmProvider]] under BOTH kinds, the registry
    * becomes a broadcast dim, and events acquire a chain via a dense
    * index — one broadcast join, counts per chain. The oracle re-derives
    * both URL templates INDEPENDENTLY in SQL from (chain_id, dataset)
    * pairs, so the Scala templating logic is genuinely cross-checked,
    * not echoed. Driver-side resolution is registry-sized (137 rows) —
    * metadata, not data. */
  def k25ProviderResolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = sqdEvmDatasets.keys.toSeq.sorted
    val dict = ids.zipWithIndex.map { case (id, i) =>
      (i, id, makeEvmProvider(Hypersync, id).url, makeEvmProvider(Sqd, id).url)
    }.toDF("idx", "chain_id", "hypersync_url", "sqd_url")
    val n = ids.size
    val counts = graft.sources.Tables(spark, dir).events
      .select(pmod(col("event_id"), lit(n)).cast("int").as("idx"))
      .groupBy(col("idx")).agg(count(lit(1)).as("c"))
    broadcast(dict).join(counts, Seq("idx"), "left")
      .select(col("chain_id"), col("hypersync_url"), col("sqd_url"),
        coalesce(col("c"), lit(0L)).as("n_events"))
      .orderBy(col("chain_id"))
  }

  private def datasetValuesSql: String =
    sqdEvmDatasets.keys.toSeq.sorted.zipWithIndex.map { case (id, i) =>
      s"($i, $id, '${sqdEvmDatasets(id)}')"
    }.mkString(", ")

  // lazy: datasetValuesSql reads sqdEvmDatasets, declared below
  lazy val oracle: Map[String, String] = Map(
    "k25_provider_resolve" ->
      s"""SELECT t.chain_id,
         |  'https://' || CAST(t.chain_id AS VARCHAR) || '.hypersync.xyz'
         |    AS hypersync_url,
         |  'https://portal.sqd.dev/datasets/' || t.dataset AS sqd_url,
         |  COUNT(e.event_id) AS n_events
         |FROM (VALUES $datasetValuesSql) AS t(idx, chain_id, dataset)
         |LEFT JOIN events e ON e.event_id % ${sqdEvmDatasets.size} = t.idx
         |GROUP BY t.chain_id, t.dataset
         |ORDER BY t.chain_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k25_provider_resolve" -> (k25ProviderResolve _)
  )

  /** The public SQD network dataset registry for EVM chains
    * (main.py:18-158; https://docs.sqd.ai/subsquid-network/reference/networks/).
    * Pure public data — chain id → dataset name. */
  val sqdEvmDatasets: Map[Long, String] = Map(
    1L -> "ethereum-mainnet",
    10L -> "optimism-mainnet",
    14L -> "flare-mainnet",
    30L -> "rootstock-mainnet",
    42L -> "ozean-testnet",
    44L -> "crab-mainnet",
    46L -> "darwinia-mainnet",
    50L -> "xdc-mainnet",
    51L -> "xdc-testnet",
    56L -> "binance-mainnet",
    81L -> "shibuya-testnet",
    97L -> "binance-testnet",
    100L -> "gnosis-mainnet",
    109L -> "shibarium",
    130L -> "unichain-mainnet",
    137L -> "polygon-mainnet",
    146L -> "sonic-mainnet",
    148L -> "shimmer-evm",
    157L -> "puppynet",
    169L -> "manta-pacific",
    195L -> "xlayer-testnet",
    196L -> "xlayer-mainnet",
    204L -> "opbnb-mainnet",
    227L -> "prom-mainnet",
    250L -> "fantom-mainnet",
    252L -> "fraxtal-mainnet",
    255L -> "kroma-mainnet",
    288L -> "boba-mainnet",
    324L -> "zksync-mainnet",
    300L -> "zksync-sepolia",
    336L -> "shiden-mainnet",
    480L -> "worldchain-mainnet",
    568L -> "dogechain-testnet",
    592L -> "astar-mainnet",
    945L -> "bittensor-testnet-evm",
    964L -> "bittensor-mainnet-evm",
    998L -> "hyperliquid-testnet",
    999L -> "hyperliquid-mainnet",
    1088L -> "metis-mainnet",
    1101L -> "polygon-zkevm-mainnet",
    1116L -> "core-mainnet",
    1135L -> "lisk-mainnet",
    1284L -> "moonbeam-mainnet",
    1285L -> "moonriver-mainnet",
    1287L -> "moonbase-testnet",
    1301L -> "unichain-sepolia",
    1625L -> "galxe-gravity",
    1750L -> "metall2-mainnet",
    1868L -> "soneium-mainnet",
    1946L -> "soneium-minato-testnet",
    1993L -> "b3-sepolia",
    1998L -> "kyoto-testnet",
    2000L -> "dogechain-mainnet",
    2109L -> "exosama",
    2442L -> "polygon-zkevm-cardona-testnet",
    2741L -> "abstract-mainnet",
    2818L -> "morph-mainnet",
    3338L -> "peaq-mainnet",
    4002L -> "fantom-testnet",
    4157L -> "crossfi-testnet",
    4158L -> "crossfi-mainnet",
    4200L -> "merlin-mainnet",
    4352L -> "memecore-mainnet",
    5000L -> "mantle-mainnet",
    5003L -> "mantle-sepolia",
    5330L -> "superseed-mainnet",
    5611L -> "opbnb-testnet",
    5678L -> "tanssi",
    6342L -> "mega-testnet",
    7560L -> "cyber-mainnet",
    7700L -> "canto",
    7701L -> "canto-testnet",
    8333L -> "b3-mainnet",
    8453L -> "base-mainnet",
    9990L -> "agung-evm",
    10143L -> "monad-testnet",
    10242L -> "arthera-mainnet",
    11124L -> "abstract-testnet",
    13371L -> "immutable-zkevm-mainnet",
    13473L -> "immutable-zkevm-testnet",
    16600L -> "0g-testnet",
    17000L -> "ethereum-holesky",
    31911L -> "poseidon-testnet",
    34443L -> "mode-mainnet",
    41455L -> "aleph-zero-evm-mainnet",
    42161L -> "arbitrum-one",
    42170L -> "arbitrum-nova",
    42220L -> "celo-mainnet",
    42225L -> "nakachain",
    42793L -> "etherlink-mainnet",
    43113L -> "avalanche-testnet",
    43114L -> "avalanche-mainnet",
    43521L -> "formicarium-testnet",
    44787L -> "celo-alfajores-testnet",
    53302L -> "superseed-sepolia",
    53935L -> "dfk-chain",
    57054L -> "sonic-blaze-testnet",
    57073L -> "ink-mainnet",
    59144L -> "linea-mainnet",
    60808L -> "bob-mainnet",
    64165L -> "sonic-testnet",
    64668L -> "bitgert-testnet",
    80002L -> "polygon-amoy-testnet",
    80084L -> "berachain-bartio",
    80094L -> "berachain-mainnet",
    81457L -> "blast-l2-mainnet",
    84532L -> "base-sepolia",
    93747L -> "stratovm-sepolia",
    98864L -> "plume-devnet",
    98865L -> "plume-legacy",
    98866L -> "plume",
    98867L -> "plume-testnet",
    128123L -> "etherlink-testnet",
    167000L -> "taiko-mainnet",
    325000L -> "camp-network-testnet-v2",
    355110L -> "bitfinity-mainnet",
    355113L -> "bitfinity-testnet",
    534351L -> "scroll-sepolia",
    534352L -> "scroll-mainnet",
    645749L -> "hyperliquid-mainnet",
    686868L -> "merlin-testnet",
    763373L -> "ink-sepolia",
    808813L -> "bob-sepolia",
    810180L -> "zklink-nova-mainnet",
    3441006L -> "manta-pacific-sepolia",
    7777777L -> "zora-mainnet",
    11155111L -> "ethereum-sepolia",
    11155420L -> "optimism-sepolia",
    11155931L -> "rise-sepolia",
    111557560L -> "cyberconnect-l2-testnet",
    168587773L -> "blast-sepolia",
    245022926L -> "neon-devnet",
    245022934L -> "neon-mainnet",
    666666666L -> "degen-chain",
    999999999L -> "zora-sepolia",
    1482601649L -> "skale-nebula",
    88153591557L -> "gelato-arbitrum-blueberry"
  )
}
