package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: scale/skew sweep of the round-2 event operators — a
  * 10×-replicated events table with 10% of rows remapped onto ONE hot
  * user, the adversarial shape for per-user sessionization and the
  * bucketed interval join.
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
    val e = Tables.events(spark, d)
    val big = (0 until 10).map { i =>
      e.withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L))
        .withColumn("user_id",
          when(pmod(col("event_id"), lit(10)) === 0, lit(1L)).otherwise(col("user_id")))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $i MINUTES"))
    }.reduce(_ unionByName _)
    big.write.mode("overwrite").parquet("/tmp/graft_big/events10.parquet")
    val b = spark.read.parquet("/tmp/graft_big/events10.parquet")
    println(s"[scratch] events10 rows=${b.count()} hot-user rows=${b.filter(col("user_id") === 1).count()}")

    time("sessionize 1M skewed") {
      graft.ops.TimeSeries.sessionize(b, "user_id", "ts", 7200, "event_id")
        .groupBy("user_id", "session_no").agg(count(lit(1)).as("n")).count()
    }
    time("intervalJoin 1M skewed") {
      val probe = b.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.ops.TimeSeries.intervalJoinAgg(probe,
        b.filter(col("event_type") === "click"),
        "user_id", "ts", "ts", "value", 3600).count()
    }
    time("asof 1M skewed") {
      graft.ops.TimeSeries.asofJoin(
        b.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
        b.filter(col("event_type") === "click").select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", "ts", Seq("value"), tiebreak = Some("value")).count()
    }
    // jaccard_capped variance re-check
    for (i <- 1 to 3)
      time(s"jaccard_capped sf0.1 #$i")(
        ops.DataQueries.jaccardCapped(spark, d).count())
    spark.stop()
  }
}
