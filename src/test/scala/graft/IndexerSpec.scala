package graft

import graft.api.Config
import graft.evm.{Indexer, Keccak, LogPipeline}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** §3.1 end-to-end: config → pushed scan → decode → partitioned sink. */
class IndexerSpec extends SparkSpec {

  private val tokenAbi =
    """[{"type":"event","name":"Transfer","inputs":[
        {"indexed":true,"name":"from","type":"address"},
        {"indexed":true,"name":"to","type":"address"},
        {"indexed":false,"name":"value","type":"uint256"}]},
       {"type":"event","name":"Approval","inputs":[
        {"indexed":true,"name":"owner","type":"address"},
        {"indexed":true,"name":"spender","type":"address"},
        {"indexed":false,"name":"value","type":"uint256"}]}]"""

  // synthesized addresses are 0x00…0{user_id % 3}
  private def addr(i: Int) = "0x" + "0" * 39 + i

  private val yaml =
    s"""rpc_url: "http://replay"
       |start_block: 0
       |chunk_size: 25
       |contracts:
       |  - name: "TokenA"
       |    address: "${addr(0)}"
       |    abi: "token.json"
       |    events: ["Transfer", "NoSuchEvent"]
       |  - name: "TokenB"
       |    address: "${addr(1)}"
       |    abi: "token.json"
       |    events: []
       |storage:
       |  type: "csv"
       |  csv:
       |    output_dir: "unused"
       |""".stripMargin

  test("config -> pushed scan -> decode -> partitioned CSV sink, with counts") {
    val dump = Files.createTempDirectory("idx_dump").toString
    LogPipeline.synthesizeLogs(Tables.events(spark, "/root/testdata/sf0.001"))
      .select(col("block_number"), col("tx_hash"), col("address"), col("topic0"),
        lower(hex(col("topic1"))).as("topic1"), lower(hex(col("topic2"))).as("topic2"),
        lit(null).cast("string").as("topic3"), lower(hex(col("data"))).as("data"))
      .coalesce(1).write.mode("overwrite").json(dump)
    val out = Files.createTempDirectory("idx_out").toString

    val job = Config.load(yaml, _ => tokenAbi)
    val counts = Indexer.run(spark, job, dump, endBlock = 99, outDir = out)
      .map(ec => (ec.contract, ec.event) -> ec.rows).toMap

    // TokenA: event filter keeps Transfer only (unknown name skipped);
    // TokenB: empty filter -> every ABI event (P2 fallback)
    assert(counts.keySet ==
      Set(("TokenA", "Transfer"), ("TokenB", "Transfer"), ("TokenB", "Approval")))

    // counts match an independent scan of the dump
    val raw = spark.read.json(dump)
    val t0 = Keccak.eventTopic0(LogPipeline.TransferSig)
    val a0 = Keccak.eventTopic0(LogPipeline.ApprovalSig)
    def expected(a: String, t: String) =
      raw.filter(col("address") === a && col("topic0") === t).count()
    assert(counts(("TokenA", "Transfer")) == expected(addr(0), t0))
    assert(counts(("TokenB", "Transfer")) == expected(addr(1), t0))
    assert(counts(("TokenB", "Approval")) == expected(addr(1), a0))
    assert(counts.values.forall(_ > 0))

    // sink layout: one partition dir per (contract, event), readable back
    val back = spark.read.option("header", "true")
      .option("basePath", out).csv(out)
    assert(back.select("contract_name", "event_name").distinct().count() == 3)
    assert(back.count() == counts.values.sum)
    // decoded payload survived the roundtrip (non-null values decoded)
    val vals = back.filter(col("event_name") === "Transfer" &&
      col("contract_name") === "TokenA")
    assert(vals.filter(col("value").isNotNull).count() > 0)

    // re-running the same job is idempotent (overwrite per event dir)
    Indexer.run(spark, job, dump, endBlock = 99, outDir = out)
    val again = spark.read.option("header", "true")
      .option("basePath", out).csv(out)
    assert(again.count() == counts.values.sum)
  }

  test("indexer scan pushes BOTH address and topic0 into the source") {
    val dump = Files.createTempDirectory("idx_push").toString
    LogPipeline.synthesizeLogs(Tables.events(spark, "/root/testdata/sf0.001"))
      .select(col("block_number"), col("tx_hash"), col("address"), col("topic0"),
        lower(hex(col("topic1"))).as("topic1"), lower(hex(col("topic2"))).as("topic2"),
        lit(null).cast("string").as("topic3"), lower(hex(col("data"))).as("data"))
      .coalesce(1).write.mode("overwrite").json(dump)
    val logs = spark.read.format("graft.evm.LogSourceProvider")
      .option("path", dump).option("startBlock", 0)
      .option("endBlock", 99).option("chunkSize", 25).load()
    val scoped = logs.filter(col("address") === addr(0) &&
      col("topic0") === Keccak.eventTopic0(LogPipeline.TransferSig))
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("addresses=1") && plan.contains("topics=1"),
      s"expected both predicates pushed:\n$plan")
  }

  test("streaming indexer: tip-follow + per-batch partitioned sink equals batch run") {
    val dump = Files.createTempDirectory("idxs_dump").toString
    LogPipeline.synthesizeLogs(Tables.events(spark, "/root/testdata/sf0.001"))
      .select(col("block_number"), col("tx_hash"), col("address"), col("topic0"),
        lower(hex(col("topic1"))).as("topic1"), lower(hex(col("topic2"))).as("topic2"),
        lit(null).cast("string").as("topic3"), lower(hex(col("data"))).as("data"))
      .coalesce(1).write.mode("overwrite").json(dump)
    val outB = Files.createTempDirectory("idxs_batch").toString
    val outS = Files.createTempDirectory("idxs_stream").toString
    val ckpt = Files.createTempDirectory("idxs_ckpt").toString

    val job = Config.load(yaml, _ => tokenAbi)
    val batchTotal = Indexer.run(spark, job, dump, endBlock = 99, outDir = outB)
      .map(_.rows).sum

    // rate-limited: the 100-block dump takes several micro-batches
    val q = Indexer.runStream(spark, job, dump, outS, ckpt,
      maxBlocksPerTrigger = 40L)
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.option("header", "true")
      .option("basePath", outS).csv(outS)
    assert(streamed.count() == batchTotal)
    assert(streamed.select("contract_name", "event_name").distinct().count() == 3)
  }
}
