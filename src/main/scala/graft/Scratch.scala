package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: stage timing of the q_evm_payout roundtrip — hex
  * synthesis vs ABI array decode vs explode/order tail — to find the
  * 6.4 s (sf0.1) bottleneck.
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
    SparkEntry.queries("q_evm_payout")(spark, d).count() // warm codegen
    import graft.evm.{AbiSchema, LogPipeline}
    val ev = AbiSchema.Event("Payout", Seq(
      AbiSchema.Param("to", "address", indexed = false),
      AbiSchema.Param("amounts", "uint256[]", indexed = false)))
    val cents = greatest(round(col("value") * 100).cast("long"), lit(0L))
    val n = pmod(col("event_id"), lit(3)) + 1
    val amtWords = array_join(
      transform(sequence(lit(1), n), j => lpad(lower(hex(cents + j)), 64, "0")), "")
    val logs = graft.Tables.events(spark, d).select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("tx_hash"),
      expr("event_id div 10").cast("long").as("block_number"),
      lit("0x" + "4" * 40).as("address"),
      lit(ev.topic0).as("topic0"),
      lit(null).cast("binary").as("topic1"),
      lit(null).cast("binary").as("topic2"),
      unhex(concat(lpad(lower(hex(col("user_id"))), 64, "0"),
        lpad(lit("40"), 64, "0"), lpad(lower(hex(n)), 64, "0"), amtWords)).as("data"),
      col("ts"))
    time("synthesis only")(logs.count())
    time("synthesis only again")(logs.count())
    val decoded = LogPipeline.decodeEvent(logs, ev, "Rewards", "1")
    time("+ decodeEvent")(decoded.count())
    time("decode forced (agg all cols)")(
      decoded.agg(sum(size(col("amounts"))) + max(length(col("to")))
        + max(length(col("data_hex")))).count())
    time("decode forced minus data_hex")(
      decoded.drop("data_hex").agg(sum(size(col("amounts"))) + max(length(col("to")))).count())
    time("decode amounts only")(
      decoded.agg(sum(size(col("amounts")))).count())
    val expl = decoded.select(col("tx_hash"), col("to").as("to_addr"),
      posexplode(col("amounts")).as(Seq("pos", "amount")))
      .withColumn("amount", col("amount").cast("long"))
    println(expl.queryExecution.executedPlan.toString.take(4000))
    time("+ posexplode")(expl.count())
    time("+ orderBy (full query)")(expl.orderBy("tx_hash", "pos").count())
    time("full again")(SparkEntry.queries("q_evm_payout")(spark, d).count())
    spark.stop()
  }
}
