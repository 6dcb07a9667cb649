package graft.evm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end EVM log pipeline (SURVEY.md §3.1 re-expressed on Spark):
  * raw logs → topic0 dispatch → ABI decode → block-timestamp enrichment
  * (distinct + broadcast join, replacing the reference's per-row RPC
  * cache, parser.go:118-130) → daily aggregation.
  *
  * Offline logs are *synthesized deterministically* from the `events`
  * test table and then decoded back — the DuckDB oracle computes the
  * expected result directly from `events`, so a correctness pass proves
  * the whole encode→keccak-dispatch→decode→enrich→aggregate loop is
  * lossless. On a real chain the same pipeline hangs off a log dump
  * (parquet) or an RPC source; nothing below depends on the synthesis.
  */
object LogPipeline {

  val TransferSig = "Transfer(address,address,uint256)"
  val ApprovalSig = "Approval(address,address,uint256)"

  /** The fixture tables are one small parquet split, so a scan feeds
    * every downstream interpreted expression (synthesis + ABI decode,
    * ~tens of µs/row as CodegenFallback) to a SINGLE core. Spread the
    * rows across the scheduler first — a few-MB round-robin exchange.
    * This is fixture plumbing only: the real DSv2 log source already
    * yields one partition per block window, so production plans never
    * need (or get) this shuffle. Measured at sf0.1: q_evm_order
    * 7.3 s → sub-second on local[32]. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Deterministic raw-log synthesis from `events`: Transfer logs for
    * click/purchase/view, Approval for error/signup; every 97th event's
    * payload is truncated garbage (exercises P7 malformed-row skip).
    * Layout matches real `eth_getLogs` rows: address, 0..3 topics
    * (binary words), ABI-encoded data, tx/block metadata. */
  def synthesizeLogs(events: DataFrame): DataFrame = {
    val t0 = lit(Keccak.eventTopic0(TransferSig))
    val a0 = lit(Keccak.eventTopic0(ApprovalSig))
    val isTransfer = col("event_type").isin("click", "purchase", "view")
    val fromWord = lpad(lower(hex(col("user_id"))), 64, "0")
    val toWord = lpad(lower(hex(pmod(col("user_id") * 7 + 1, lit(1000)))), 64, "0")
    // clamped for the same reason as swapDecode's `cents`: the uint256
    // word encoding below is only total for non-negative longs
    val valueCents = greatest(round(col("value") * 100).cast("long"), lit(0L))
    spread(events).select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      expr("event_id div 10").cast("long").as("block_number"),
      concat(lit("0x"), lpad(lower(hex(pmod(col("user_id"), lit(3)))), 40, "0"))
        .as("address"),
      when(isTransfer, t0).otherwise(a0).as("topic0"),
      unhex(fromWord).as("topic1"),
      unhex(toWord).as("topic2"),
      when(pmod(col("event_id"), lit(97)) === 0, unhex(lit("dead")))
        .otherwise(unhex(lpad(lower(hex(valueCents)), 64, "0"))).as("data"),
      col("ts"))
  }

  /** Whale-scale Transfer fixture: the payload word is the full-range
    * uint256 `value = cents·2^128 + event_id` (≈3e42 for typical cents
    * — far beyond DecimalType(38,0), where [[decodeEvent]]'s typed path
    * deliberately yields null per SURVEY §7.4). Exercises the limb
    * decode and [[Uint256SumAgg]] on values no 128-bit engine type can
    * hold. Same deterministic synthesis contract as
    * [[synthesizeLogs]]: the oracle recomputes expected limb sums from
    * the formula, so the encode→decode→aggregate loop is independently
    * gated. */
  def synthesizeWhaleLogs(events: DataFrame): DataFrame = {
    val isTransfer = col("event_type").isin("click", "purchase", "view")
    val cents = greatest(round(col("value") * 100).cast("long"), lit(0L))
    spread(events).filter(isTransfer).select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      expr("event_id div 10").cast("long").as("block_number"),
      concat(lit("0x"), lpad(lower(hex(pmod(col("user_id"), lit(3)))), 40, "0"))
        .as("token"),
      // 32-byte big-endian word: [0]*8 ‖ cents(8B, bits 191..128) ‖
      // [0]*8 ‖ event_id(8B, bits 63..0)
      unhex(concat(lit("0" * 16), lpad(lower(hex(cents)), 16, "0"),
        lit("0" * 16), lpad(lower(hex(col("event_id"))), 16, "0")))
        .as("data"))
  }

  /** 32-byte uint256 word → 8 little-endian 32-bit limbs (limb i =
    * bits [32i, 32i+32)) as longs. 32-bit limbs, not 64: per-limb
    * group sums then stay exactly representable in BIGINT up to ~2e9
    * rows per group AND map to int64 on every engine (the oracle's
    * HUGEINT-free gate constraint). Pure hex/substring arithmetic —
    * whole-stage-codegen'd, no UDF. */
  def uint256Limbs(data: Column): Column = {
    val h = lpad(lower(hex(data)), 64, "0")
    array((0 until 8).map { i =>
      conv(substring(h, 57 - 8 * i, 8), 16, 10).cast("long")
    }: _*)
  }

  /** J4: contract-registry enrichment — the configured
    * `map[address]ContractConfig` (`indexer.go:51-62`) as a broadcast
    * dimension join; unknown addresses keep null contract_name (the
    * reference's minimal-event path, parser.go:54-61). */
  def enrichContracts(logs: DataFrame,
                      contracts: Seq[(String, String)]): DataFrame = {
    val spark = logs.sparkSession
    import spark.implicits._
    val dim = contracts.toDF("__addr", "contract_name")
      .withColumn("__addr", lower(col("__addr")))
    logs.join(broadcast(dim), lower(col("address")) === col("__addr"), "left")
      .drop("__addr")
  }

  /** C6: per-batch progress metrics — the reference's
    * `[OK] Block a → b | Events: n` chunk log (`indexer.go:160-161`)
    * becomes an `Observation` on the decoded stream: run any action on
    * the returned frame, then read `obs.get` for events/blocks counts. */
  def observed(df: DataFrame, name: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, count(lit(1)).as("events"),
      min(col("block_number")).as("from_block"),
      max(col("block_number")).as("to_block")), obs)
  }

  /** Per-block timestamps: the enrichment dimension (stand-in for
    * `HeaderByNumber`), built once and broadcast — the Spark form of the
    * reference's per-block memo cache (J1). */
  def blockTimestamps(logs: DataFrame): DataFrame =
    logs.groupBy("block_number").agg(min("ts").as("block_ts"))

  /** Decode Transfer logs: plan-time topic0 filter (P1/P3), indexed
    * topics via abi_decode_word (P5), payload via abi_decode_data (P4),
    * metadata projection (P6), raw-hex fallback for malformed payloads
    * (P5/P7). */
  def decodeTransfers(logs: DataFrame): DataFrame = {
    val t0 = Keccak.eventTopic0(TransferSig) // plan-time constant
    logs.filter(col("topic0") === lit(t0))
      .select(
        col("tx_hash"), col("block_number"), col("address").as("contract"),
        lit("Token").as("contract_name"), lit("Transfer").as("event_name"),
        lit("1").as("chain_id"),
        expr("abi_decode_word(topic1, 'address')").as("from_addr"),
        expr("abi_decode_word(topic2, 'address')").as("to_addr"),
        expr("abi_decode_data(data, 'uint256')").getField("arg0").as("value"),
        coalesce(expr("abi_decode_data(data, 'uint256')").getField("arg0").cast("string"),
          concat(lit("0x"), lower(hex(col("data"))))).as("value_or_hex"))
  }

  /** Generic event decode: given a parsed ABI event, build the full
    * decoded projection — plan-time topic0 filter (P3), indexed params
    * from topics (P5), payload struct decoded once (P4), fixed metadata
    * columns (P6, parser.go:45-52). Every decoded row also keeps
    * `data_hex`, the lossless raw payload (uint256/uint160 values
    * beyond 38 digits decode to null per SURVEY §7.4 — the hex column
    * is the shadow). This is the API a reference user calls per
    * (contract, event) pair. */
  def decodeEvent(logs: DataFrame, ev: AbiSchema.Event, contractName: String,
                  chainId: String): DataFrame = {
    val dataTypes = ev.dataParams.map(_.abiType).mkString(",")
    val meta = Seq(
      col("tx_hash"), col("block_number"), col("address").as("contract"),
      lit(contractName).as("contract_name"), lit(ev.name).as("event_name"),
      lit(chainId).as("chain_id"))
    val indexed = ev.indexedParams.zipWithIndex.map { case (p, i) =>
      expr(s"abi_decode_word(topic${i + 1}, '${p.abiType}')").as(p.name)
    }
    val withStruct = logs.filter(col("topic0") === lit(ev.topic0))
      .withColumn("__d",
        if (ev.dataParams.isEmpty) lit(null) else expr(s"abi_decode_data(data, '$dataTypes')"))
    val payload = ev.dataParams.zipWithIndex.map { case (p, i) =>
      col("__d").getField(s"arg$i").as(p.name)
    }
    withStruct.select(meta ++ indexed ++ payload :+
      concat(lit("0x"), lower(hex(col("data")))).as("data_hex"): _*)
  }

  /** raw_params escape hatch (SURVEY §1.5): logs whose topic0 matches
    * NO configured ABI event still flow through as decoded rows —
    * metadata columns plus a lossless `MapType(String,String)` of the
    * raw topic/data hex — instead of being dropped by the plan-time
    * `topic0 === lit(...)` dispatch. This mirrors the reference's
    * minimal-event path (`internal/parser/parser.go:54-61`), which
    * emits metadata + raw topics for unknown events. Union this with
    * the per-event [[decodeEvent]] frames for full-coverage ingestion:
    * every input log lands in exactly one output. Map-only projection —
    * no join, no shuffle, safe at any scale. */
  def decodeUnknown(logs: DataFrame, knownTopic0s: Seq[String],
                    chainId: String): DataFrame = {
    val hexOf = (c: Column) => concat(lit("0x"), lower(hex(c)))
    // sources differ in which topic slots they carry (synthesized
    // frames have no topic3); absent slots simply don't enter the map
    val entries =
      Seq(lit("topic0") -> col("topic0").cast("string")) ++
        (1 to 3).collect {
          case i if logs.columns.contains(s"topic$i") =>
            lit(s"topic$i") -> hexOf(col(s"topic$i"))
        } :+ (lit("data") -> hexOf(col("data")))
    val raw = map(entries.flatMap { case (k, v) => Seq(k, v) }: _*)
    logs.filter(!col("topic0").isin(knownTopic0s: _*))
      .select(col("tx_hash"), col("block_number"),
        col("address").as("contract"),
        lit(null).cast("string").as("contract_name"),
        lit(null).cast("string").as("event_name"),
        lit(chainId).as("chain_id"),
        map_filter(raw, (_, v) => v.isNotNull).as("raw_params"))
  }

  /** J2: tx-sender enrichment — the Spark form of the reference's
    * per-event `types.Sender` stamp (`internal/parser/parser.go:152-
    * 159`). The expensive ECDSA recovery runs ONCE per distinct
    * transaction on the small dimension side, then broadcast-joins back
    * onto the (much larger) decoded-log side — same restructuring as
    * the block-timestamp cache (J1). `txs` carries the signature
    * material (`tx_hash`, `msg_hash`/`sig_r`/`sig_s` binary, `rec_id`
    * int); a missing tx or invalid signature leaves tx_from null, the
    * reference's best-effort `err == nil` guard. At backfill scale the
    * tx dim is bounded by txs-per-block × block range; drop the
    * broadcast hint and let AQE pick the join if a range outgrows it. */
  def attachTxFrom(rows: DataFrame, txs: DataFrame): DataFrame = {
    val senders = txs.dropDuplicates("tx_hash")
      .select(col("tx_hash"),
        expr("ecrecover_sender(msg_hash, sig_r, sig_s, rec_id)").as("tx_from"))
    rows.join(broadcast(senders), Seq("tx_hash"), "left")
  }

  /** Live J2: the reference's `TransactionByHash` → `types.Sender`
    * loop (parser.go:152-159), distributed. Distinct tx hashes fan out
    * over partitions; each partition owns one RPC client and issues
    * one `eth_getTransactionByHash` per tx, recovers the sender from
    * the legacy RLP sighash (TxSender), and the resulting small
    * (tx_hash, tx_from) dimension broadcast-joins back in
    * [[attachTxFrom]]-style. `mapPartitions` is the honest tool here —
    * per-row RPC is the reference's own access pattern, and the
    * distinct projection bounds it to one call per transaction. */
  def rpcTxSenders(txHashes: DataFrame, cfg: RpcConfig): DataFrame = {
    val spark = txHashes.sparkSession
    import spark.implicits._
    txHashes.select(col("tx_hash").cast("string")).distinct().as[String]
      .mapPartitions { it =>
        val cli = new RpcClient(cfg)
        it.map(h => (h, cli.getTransaction(h).map(TxSender.sender).orNull))
      }.toDF("tx_hash", "tx_from")
  }

  /** Stamp tx_from on decoded rows straight from a live endpoint. */
  def attachTxFromRpc(rows: DataFrame, cfg: RpcConfig): DataFrame =
    rows.join(broadcast(rpcTxSenders(rows.select("tx_hash"), cfg)),
      Seq("tx_hash"), "left")

  /** Deterministic signature synthesis for the fixture: five tiny
    * well-known private keys (1..5); each tx signs one of five fixed
    * messages chosen by `event_id % 5`. Only the 5 (msg, key) pairs are
    * signed on the driver — the synthesized dim broadcast-joins onto
    * the per-tx rows, and recovery itself runs distributed in
    * `attachTxFrom`. Recovered addresses are pinned as literals in the
    * q_evm_txfrom oracle, so a regression anywhere in the
    * sign → encode → recover → join loop diverges from DuckDB. */
  def synthesizeTxs(events: DataFrame): DataFrame = {
    import java.math.BigInteger
    val spark = events.sparkSession
    def pad32(b: BigInteger): Array[Byte] = {
      val raw = b.toByteArray.dropWhile(_ == 0)
      val out = new Array[Byte](32)
      System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
      out
    }
    val dimRows = (0 until 5).map { i =>
      val priv = BigInteger.valueOf(i + 1L)
      val msg = Keccak.hash256(s"graft-tx-$i".getBytes("UTF-8"))
      val (r, s, recId) = Secp256k1.sign(msg, priv,
        BigInteger.valueOf(1000003L + i))
      org.apache.spark.sql.Row(i, msg, pad32(r), pad32(s), recId)
    }
    val dimSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key_id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("msg_hash",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("sig_r",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("sig_s",
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("rec_id",
        org.apache.spark.sql.types.IntegerType)))
    val dim = spark.createDataFrame(
      spark.sparkContext.parallelize(dimRows, 1), dimSchema)
    events.select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      pmod(col("event_id"), lit(5)).cast("int").as("key_id"))
      .join(broadcast(dim), Seq("key_id"))
      .drop("key_id")
  }

  /** Decoded + enriched Transfer rows (block timestamp joined broadcast). */
  def enrichedTransfers(spark: SparkSession, dir: String): DataFrame = {
    val logs = synthesizeLogs(Tables.events(spark, dir))
    decodeTransfers(logs)
      .join(broadcast(blockTimestamps(logs)), Seq("block_number"), "left")
  }

  /** Swap-style decode roundtrip exercising the SIGNED int24 path
    * (two's-complement words, negative ticks) and the uint160 >38-digit
    * overflow policy (SURVEY §7.4: decimal when it fits, null
    * otherwise) in one oracle-gated query. Logs are synthesized from
    * `events`: tick = cents − 50000 (sign varies), sqrt_price = cents,
    * except every 7th event writes k·2¹²⁸ (39+ digits → decodes null).
    * The oracle recomputes all three columns from `events` directly, so
    * a pass proves the encode→decode loop including sign extension and
    * the overflow cutoff. */
  def swapDecode(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = AbiSchema.Event("Swap", Seq(
      AbiSchema.Param("tick", "int24", indexed = false),
      AbiSchema.Param("sqrt_price", "uint160", indexed = false)))
    // uint160 encoding below is only total for non-negative words;
    // clamp so a negative `value` in future fixtures can't silently
    // two's-complement into ~2^64 (greatest = abs-free, keeps 0 floor)
    val cents = greatest(round(col("value") * 100).cast("long"), lit(0L))
    val tick = cents - 50000L
    // 256-bit two's complement from a 64-bit long: sign-extend with 'f'
    val tickWord = when(tick >= 0, lpad(lower(hex(tick)), 64, "0"))
      .otherwise(lpad(lower(hex(tick)), 64, "f"))
    val k = pmod(col("event_id"), lit(100)) + 1
    val over = pmod(col("event_id"), lit(7)) === 0
    // k·2^128 ≥ 2^128 ≈ 3.4e38 > 10^38−1 → overflow branch, always
    val sqrtWord = when(over,
        concat(lpad(lower(hex(k)), 32, "0"), lit("0" * 32)))
      .otherwise(lpad(lower(hex(cents)), 64, "0"))
    val logs = spread(graft.Tables.events(spark, dir)).select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      expr("event_id div 10").cast("long").as("block_number"),
      lit("0x" + "3" * 40).as("address"),
      lit(ev.topic0).as("topic0"),
      lit(null).cast("binary").as("topic1"),
      lit(null).cast("binary").as("topic2"),
      unhex(concat(tickWord, sqrtWord)).as("data"),
      col("ts"))
    decodeEvent(logs, ev, "Pool", "1")
      .select(col("tx_hash"),
        col("tick").cast("long").as("tick"),
        col("sqrt_price").cast("long").as("sqrt_price"),
        col("sqrt_price").isNull.as("overflowed"))
  }

  /** Dynamic-array decode roundtrip: `Payout(address to, uint256[]
    * amounts)` — a static head word, then an offset word into a
    * length-prefixed tail whose length VARIES per row (1..3 by
    * event_id % 3). Logs are synthesized columnar from `events`
    * (amounts_j = cents + j), decoded through the full tail walk in
    * `AbiCodec.decodeData`, and exploded one row per element; the
    * oracle recomputes every (pos, amount) from `events` directly, so
    * a pass proves offsets, lengths and element order survive the
    * encode → decode loop. */
  def payoutDecode(spark: SparkSession, dir: String): DataFrame = {
    val ev = AbiSchema.Event("Payout", Seq(
      AbiSchema.Param("to", "address", indexed = false),
      AbiSchema.Param("amounts", "uint256[]", indexed = false)))
    val cents = greatest(round(col("value") * 100).cast("long"), lit(0L))
    val n = pmod(col("event_id"), lit(3)) + 1
    val toWord = lpad(lower(hex(col("user_id"))), 64, "0")
    val offWord = lpad(lit("40"), 64, "0") // tail starts after 2 head words
    val lenWord = lpad(lower(hex(n)), 64, "0")
    val amtWords = array_join(
      transform(sequence(lit(1), n), j => lpad(lower(hex(cents + j)), 64, "0")), "")
    val logs = spread(graft.Tables.events(spark, dir)).select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      expr("event_id div 10").cast("long").as("block_number"),
      lit("0x" + "4" * 40).as("address"),
      lit(ev.topic0).as("topic0"),
      lit(null).cast("binary").as("topic1"),
      lit(null).cast("binary").as("topic2"),
      unhex(concat(toWord, offWord, lenWord, amtWords)).as("data"),
      col("ts"))
    // posexplode_OUTER + a post-filter on the generated attribute, NOT
    // plain posexplode: InferFiltersFromGenerate only fires on
    // non-outer generators, and here it would infer
    // size(amounts)>0 AND isnotnull(amounts) and push it below the
    // projection, substituting the whole interpreted abi_decode_data
    // (synthesis tree included) into the Filter — decode ran 3× per
    // row, 5.5 s vs 0.9 s at sf0.1. Dropping pos-null rows afterwards
    // is exactly posexplode's null/empty-array behavior.
    decodeEvent(logs, ev, "Rewards", "1")
      .select(col("tx_hash"), col("to").as("to_addr"),
        posexplode_outer(col("amounts")).as(Seq("pos", "amount")))
      .filter(col("pos").isNotNull)
      .withColumn("amount", col("amount").cast("long"))
  }

  /** Nested-tuple decode roundtrip: `OrderPlaced(address maker,
    * (uint256 amount, (address token, uint128 qty)[] legs) order)` — a
    * dynamic tuple behind an offset head whose second component is an
    * array of static tuples, so every region form the public ABI spec
    * defines (tuple head walk, region-relative nested offsets,
    * length-prefixed element region) is crossed in one payload. The
    * reference decodes tuples generically via go-ethereum
    * (`internal/parser/parser.go:74-77`). Synthesis is columnar from
    * `events` (legs vary 1..2 per row); the oracle recomputes every
    * (pos, token, qty) from the same columns, so a pass proves the
    * whole nested encode → decode loop. */
  def orderDecode(spark: SparkSession, dir: String): DataFrame = {
    val ev = AbiSchema.Event("OrderPlaced", Seq(
      AbiSchema.Param("maker", "address", indexed = false),
      AbiSchema.Param("order", "(uint256,(address,uint128)[])",
        indexed = false)))
    val cents = greatest(round(col("value") * 100).cast("long"), lit(0L))
    val n = pmod(col("event_id"), lit(2)) + 1
    val makerWord = lpad(lower(hex(col("user_id"))), 64, "0")
    val off = lpad(lit("40"), 64, "0") // both regions: tail after 2 heads
    val amountWord = lpad(lower(hex(cents)), 64, "0")
    val lenWord = lpad(lower(hex(n)), 64, "0")
    val legWords = array_join(
      transform(sequence(lit(1), n), j => concat(
        lpad(lower(hex(col("user_id") * 3 + j)), 64, "0"),
        lpad(lower(hex(cents + j * 10)), 64, "0"))), "")
    val logs = spread(graft.Tables.events(spark, dir)).select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      expr("event_id div 10").cast("long").as("block_number"),
      lit("0x" + "5" * 40).as("address"),
      lit(ev.topic0).as("topic0"),
      lit(null).cast("binary").as("topic1"),
      lit(null).cast("binary").as("topic2"),
      unhex(concat(makerWord, off, amountWord, off, lenWord, legWords))
        .as("data"),
      col("ts"))
    // posexplode_outer + pos-null filter, same InferFiltersFromGenerate
    // dodge as payoutDecode above
    decodeEvent(logs, ev, "Exchange", "1")
      .select(col("tx_hash"), col("maker"),
        col("order").getField("f0").cast("long").as("amount"),
        posexplode_outer(col("order").getField("f1")).as(Seq("pos", "leg")))
      .filter(col("pos").isNotNull)
      .select(col("tx_hash"), col("maker"), col("amount"), col("pos"),
        col("leg").getField("f0").as("token"),
        col("leg").getField("f1").cast("long").as("qty"))
  }

  /** Daily transfer volume: the §7.2 flagship slice — decode, enrich,
    * date_trunc aggregate. Malformed payloads (null value) are dropped
    * and counted separately upstream (P7). */
  def dailyVolume(spark: SparkSession, dir: String): DataFrame =
    enrichedTransfers(spark, dir)
      .filter(col("value").isNotNull)
      .groupBy(to_date(date_trunc("day", col("block_ts"))).as("day"))
      .agg(sum(col("value")).cast("long").as("volume"),
        count(lit(1)).as("n_transfers"))
}
