package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.SvmInstr

/** Temporary round-3 perf dissection main (deleted before round end). */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $label: median=${ts.sorted.apply(1)}%.3f min=${ts.min}%.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(SparkEntry.queries("q01_agg_filter")(spark, sfDir)) // warmup

    val t = graft.sources.Tables(spark, sfDir)

    // ---- rebuild p05 stage by stage (mirrors SvmInstr.p05OrcaMetadata) ----
    val v1 = pmod(col("l_orderkey"), lit(2)) === 0
    val tick = pmod(col("l_partkey"), lit(1000))
    val price = floor(col("l_extendedprice") * 1000).cast("long")
    val u128le: Column => Column = c =>
      concat(le_from_long(c, 8), lit(Array.fill[Byte](8)(0)))
    val data = when(v1,
        concat(lit(SvmInstr.anchorDiscriminator("initialize_pool")),
          le_from_long(pmod(col("l_linenumber"), lit(256)).cast("long"), 1),
          le_from_long(tick.cast("long"), 2), u128le(price)))
      .otherwise(
        concat(lit(SvmInstr.anchorDiscriminator("initialize_pool_v2")),
          le_from_long(tick.cast("long"), 2), u128le(price)))
    val filler = u256_from_long(lit(0L))
    val whirlpool = u256_from_long(col("l_orderkey") * 10 + col("l_linenumber"))
    val instructions = t.lineitem.select(
      col("l_orderkey").as("block_slot"),
      col("l_linenumber").as("transaction_index"),
      lit(Base58.decode("whirLbMiicVdio4qvUfM5KAg6Ct8VwpYzGff3uctyCc")).as("program_id"),
      data.as("data"),
      array(filler, u256_from_long(col("l_partkey")),
        u256_from_long(col("l_suppkey")), filler, whirlpool, filler,
        whirlpool).as("accounts"))

    time("1_synth_instructions") { noop(instructions) }

    val decoded = SvmInstr.decodeVariants(instructions,
        SvmInstr.orcaPoolInitRegistry,
        passThrough = Seq("block_slot", "transaction_index"))
      .withColumn("version",
        when(col("swap_kind") === "pool_init_v1", 1L).otherwise(2L))
      .drop("swap_kind")
    time("2_decoded") { noop(decoded) }

    val transactions = t.lineitem.select(
      col("l_orderkey").as("block_slot"),
      col("l_linenumber").as("transaction_index"),
      md5(concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))).as("transaction_signature"))
      .distinct()
    time("3_transactions_distinct") { noop(transactions) }

    val blocks = t.orders.select(
      col("o_orderkey").as("block_slot"),
      col("o_custkey").as("block_height"),
      col("o_orderdate").as("block_date"))

    val joined = decoded
      .join(transactions, Seq("block_slot", "transaction_index"), "left")
      .join(blocks, Seq("block_slot"), "left")
      .select(col("block_slot"), col("transaction_index"), col("version"),
        col("whirlpool_bump"), col("tick_spacing"),
        col("initial_sqrt_price").cast("long").as("initial_sqrt_price"),
        lower(hex(col("token_mint_a"))).as("token_mint_a"),
        lower(hex(col("token_mint_b"))).as("token_mint_b"),
        lower(hex(col("whirlpool"))).as("whirlpool"),
        col("transaction_signature"), col("block_height"), col("block_date"))
    time("4_joined_no_sort") { noop(joined) }
    time("5_full_with_sort") { noop(joined.orderBy(col("block_slot"), col("transaction_index"))) }

    // ---- optimized variant ----
    // one clustering (block_slot) reused by the dedupe and BOTH joins;
    // hex/md5 projections moved after the sort so the range exchange and
    // its sampling pass move narrow binary rows
    val decodedP = decoded.repartition(col("block_slot"))
    val transactionsP = t.lineitem.select(
        col("l_orderkey").as("block_slot"),
        col("l_linenumber").as("transaction_index"))
      .repartition(col("block_slot"))
      .dropDuplicates("block_slot", "transaction_index")
      .withColumn("transaction_signature",
        md5(concat(col("block_slot").cast("string"), lit(":"),
          col("transaction_index").cast("string"))))
    val joinedOpt = decodedP
      .join(transactionsP, Seq("block_slot", "transaction_index"), "left")
      .join(blocks.repartition(col("block_slot")), Seq("block_slot"), "left")
      .orderBy(col("block_slot"), col("transaction_index"))
      .select(col("block_slot"), col("transaction_index"), col("version"),
        col("whirlpool_bump"), col("tick_spacing"),
        col("initial_sqrt_price").cast("long").as("initial_sqrt_price"),
        lower(hex(col("token_mint_a"))).as("token_mint_a"),
        lower(hex(col("token_mint_b"))).as("token_mint_b"),
        lower(hex(col("whirlpool"))).as("whirlpool"),
        col("transaction_signature"),
        col("block_height"), col("block_date"))
    time("6_optimized") { noop(joinedOpt) }
    joinedOpt.explain("formatted")
    spark.stop()
  }
}
