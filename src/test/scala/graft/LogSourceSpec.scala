package graft

import graft.evm.{Keccak, LogPipeline}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LogSourceSpec extends SparkSpec {

  private def dumpDir: String = {
    val dir = Files.createTempDirectory("evm_logs").toString
    // JSON-lines dump of synthesized logs (hex-encoded binary columns)
    LogPipeline.synthesizeLogs(Tables.events(spark, "/root/testdata/sf0.001"))
      .select(col("block_number"), col("tx_hash"), col("address"), col("topic0"),
        lower(hex(col("topic1"))).as("topic1"), lower(hex(col("topic2"))).as("topic2"),
        lit(null).cast("string").as("topic3"), lower(hex(col("data"))).as("data"))
      .coalesce(1).write.mode("overwrite").json(dir)
    dir
  }

  private def read(dir: String, chunk: Int = 10) =
    spark.read.format("graft.evm.LogSourceProvider")
      .option("path", dir).option("startBlock", 0)
      .option("endBlock", 99).option("chunkSize", chunk).load()

  test("chunked block-range partitioning: one task per block window (S1)") {
    val dir = dumpDir
    val df = read(dir, chunk = 10)
    assert(df.rdd.getNumPartitions == 10) // blocks 0..99 / 10
    assert(df.count() == 1000) // sf0.001 events
  }

  test("address/topic0 filters are pushed into the source (P1)") {
    val dir = dumpDir
    val t0 = Keccak.eventTopic0(LogPipeline.TransferSig)
    val filtered = read(dir).filter(col("topic0") === t0)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("topics=1"),
      s"expected pushdown marker in plan:\n$scan")
    // semantics: matches the unfiltered count of transfer-typed rows
    val expected = read(dir).collect().count(_.getAs[String]("topic0") == t0)
    assert(filtered.count() == expected && expected > 0)
  }

  test("two pushed scans unioned = fallback semantics (P2)") {
    val dir = dumpDir
    val t0 = Keccak.eventTopic0(LogPipeline.TransferSig)
    val a0 = Keccak.eventTopic0(LogPipeline.ApprovalSig)
    val both = read(dir).filter(col("topic0") === t0)
      .unionByName(read(dir).filter(col("topic0") === a0))
    assert(both.count() == 1000)
  }

  test("block_number predicates prune chunk partitions at the source") {
    val dir = dumpDir
    val pruned = read(dir, chunk = 10).filter(col("block_number") >= 50)
    assert(pruned.rdd.getNumPartitions == 5) // 50..99 / 10
    assert(pruned.select(min(col("block_number"))).head().getLong(0) >= 50)
    val band = read(dir, chunk = 10)
      .filter(col("block_number") >= 20 && col("block_number") < 40)
    assert(band.rdd.getNumPartitions == 2)
    assert(band.count() > 0)
  }

  test("block window bounds are respected") {
    val dir = dumpDir
    val df = spark.read.format("graft.evm.LogSourceProvider")
      .option("path", dir).option("startBlock", 10)
      .option("endBlock", 19).option("chunkSize", 5).load()
    assert(df.rdd.getNumPartitions == 2)
    val blocks = df.select("block_number").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(blocks.head >= 10 && blocks.last <= 19 && blocks.nonEmpty)
  }
}
