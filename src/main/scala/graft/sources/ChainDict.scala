package graft.sources

/** chain_id → chain_name dictionary at reference scale — the full public
  * EVM chain mapping the reference registers as a ClickHouse DICTIONARY
  * (config.py:27-101 EVM_CHAIN_NAME, 73 entries; db.py create_dict;
  * evm/chain_id.py dictGet). Sorted by chain id.
  */
object ChainDict {
  val entries: Seq[(Long, String)] = Seq(
    1L -> "ethereum", 10L -> "optimism",
    14L -> "flare", 30L -> "rootstock",
    42L -> "lukso", 50L -> "xdc",
    51L -> "xdc_testnet", 56L -> "bsc",
    97L -> "bsc_testnet", 100L -> "gnosis",
    130L -> "unichain", 137L -> "polygon",
    146L -> "sonic", 148L -> "shimmer_evm",
    169L -> "manta", 204L -> "opbnb",
    250L -> "fantom", 252L -> "fraxtal",
    255L -> "kroma", 288L -> "boba",
    324L -> "zksync", 480L -> "worldchain",
    1101L -> "polygon_zkevm", 1135L -> "lisk",
    1287L -> "moonbase_alpha", 1301L -> "unichain_sepolia",
    1750L -> "metall2", 1868L -> "soneium",
    2741L -> "abstract", 2810L -> "morph_holesky",
    2818L -> "morph", 4200L -> "merlin",
    4201L -> "lukso_testnet", 5000L -> "mantle",
    5115L -> "citrea_testnet", 5330L -> "superseed",
    6342L -> "megaeth_testnet", 7000L -> "zeta",
    7560L -> "cyber", 8453L -> "base",
    8888L -> "chiliz", 10143L -> "monad_testnet",
    10200L -> "gnosis_chiado", 17000L -> "holesky",
    17864L -> "mev_commit", 33111L -> "curtis",
    34443L -> "mode", 42161L -> "arbitrum",
    42170L -> "arbitrum_nova", 42220L -> "celo",
    43113L -> "fuji", 43114L -> "avalanche",
    48900L -> "zirciut", 50002L -> "pharos_devnet",
    50104L -> "sophon", 57073L -> "ink",
    59144L -> "linea", 80002L -> "polygon_amoy",
    80084L -> "berachain_bartio", 80094L -> "berachain",
    84532L -> "base_sepolia", 421614L -> "arbitrum_sepolia",
    534352L -> "scroll", 645749L -> "hyperliquid_evm",
    696969L -> "galadriel_devnet", 7225878L -> "saakuru",
    7777777L -> "zora", 11155111L -> "sepolia",
    11155420L -> "optimism_sepolia", 168587773L -> "blast_sepolia",
    531050104L -> "sophon_testnet", 1313161554L -> "aurora",
    1666600000L -> "harmony_shard_0")

  /** Stable dense index (0..n-1) per entry, for synthetic key assignment
    * in tests/queries. */
  def indexed: Seq[(Int, Long, String)] =
    entries.zipWithIndex.map { case ((id, name), i) => (i, id, name) }
}
