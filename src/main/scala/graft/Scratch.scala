package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: stage timing of the q_evm_order nested-tuple decode
  * (synthesis → decode → explode) at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    SparkEntry.entry(spark).count() // warm
    SparkEntry.queries("q_evm_order")(spark, d).count() // warm codegen
    SparkEntry.queries("q_evm_payout")(spark, d).count()
    time("payout full")(SparkEntry.queries("q_evm_payout")(spark, d).count())
    time("order full")(SparkEntry.queries("q_evm_order")(spark, d).count())

    // stage decomposition of orderDecode
    import graft.evm.{AbiSchema, LogPipeline}
    val ev = AbiSchema.Event("OrderPlaced", Seq(
      AbiSchema.Param("maker", "address", indexed = false),
      AbiSchema.Param("order", "(uint256,(address,uint128)[])", indexed = false)))
    val cents = greatest(round(col("value") * 100).cast("long"), lit(0L))
    val n = pmod(col("event_id"), lit(2)) + 1
    val makerWord = lpad(lower(hex(col("user_id"))), 64, "0")
    val off = lpad(lit("40"), 64, "0")
    val amountWord = lpad(lower(hex(cents)), 64, "0")
    val lenWord = lpad(lower(hex(n)), 64, "0")
    val legWords = array_join(
      transform(sequence(lit(1), n), j => concat(
        lpad(lower(hex(col("user_id") * 3 + j)), 64, "0"),
        lpad(lower(hex(cents + j * 10)), 64, "0"))), "")
    val logs = Tables.events(spark, d).select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      expr("event_id div 10").cast("long").as("block_number"),
      lit("0x" + "5" * 40).as("address"),
      lit(ev.topic0).as("topic0"),
      lit(null).cast("binary").as("topic1"),
      lit(null).cast("binary").as("topic2"),
      unhex(concat(makerWord, off, amountWord, off, lenWord, legWords)).as("data"),
      col("ts"))
    time("synthesis only")(logs.agg(sum(length(col("data")))).count())
    val decoded = LogPipeline.decodeEvent(logs, ev, "Exchange", "1")
    time("decode, no explode")(decoded.select("tx_hash", "maker", "order").count())
    time("decode forced")(
      decoded.agg(sum(col("order").getField("f0"))).count())
    import graft.evm.AbiCodec
    def calls(name: String)(f: => Unit): Unit = {
      val c0 = AbiCodec.decodeCalls.sum()
      f
      println(s"[scratch] $name decode calls: ${AbiCodec.decodeCalls.sum() - c0}")
    }
    calls("agg")(decoded.agg(sum(size(col("order").getField("f1")))).count())
    calls("explode")(
      decoded.select(posexplode_outer(col("order").getField("f1"))).count())
    spark.stop()
  }
}
