package graft

import graft.api.JobRegistry
import graft.ops.Multimodal
import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = Files.createTempDirectory("graft_dpo").toString
    val day1 = Seq((1L, "d1", 10.0), (2L, "d1", 20.0)).toDF("id", "day", "v")
    val day2 = Seq((3L, "d2", 30.0)).toDF("id", "day", "v")
    Sinks.writePartitionedParquet(day1.unionByName(day2), dir, Seq("day"))
    // re-run day1 only, with corrected rows: day2 must survive
    val fixed = Seq((1L, "d1", 11.0)).toDF("id", "day", "v")
    Sinks.writePartitionedParquet(fixed, dir, Seq("day"))
    val back = spark.read.parquet(dir)
      .select("id", "day", "v").as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "d1", 11.0), (3L, "d2", 30.0)))
  }

  test("partitioned CSV sink roundtrips with stable per-partition schema (S4)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq(
      ("0xaa", 1L, "Token", "Transfer", "100"),
      ("0xbb", 2L, "Token", "Approval", "200"),
      ("0xcc", 3L, "Pool", "Swap", "300")
    ).toDF("tx_hash", "block_number", "contract_name", "event_name", "value")
    Sinks.writeEventsCsv(df, dir)
    val back = spark.read.option("header", "true").csv(s"$dir/*/*")
    assert(back.count() == 3)
    // partition columns come back from the directory layout
    val full = spark.read.option("header", "true")
      .option("basePath", dir).csv(s"$dir/contract_name=*/event_name=*")
    assert(full.select("contract_name").distinct().count() == 2)
  }

  test("filename metadata extraction on glob reads (S8)") {
    val dir = Files.createTempDirectory("graft_glob").toString
    Seq(("1", "2")).toDF("timestamp", "tick").coalesce(1)
      .write.option("header", "true").csv(s"$dir/DAIUSDC500_Swap")
    val read = spark.read.option("header", "true").csv(s"$dir/*_Swap/*.csv")
    val got = Sinks.readWithFilenameMeta(read,
        ".*/([A-Z]+?)(USDC|USDT|ETH)(100|500|3000)_Swap.*", Seq(("a", 1), ("b", 2), ("fee", 3)))
      .select("a", "b", "fee").head()
    assert(got.getString(0) == "DAI" && got.getString(1) == "USDC"
      && got.getString(2) == "500")
  }

  test("retry decorator: recovers, then propagates last error (S6)") {
    var calls = 0
    val got = Sinks.withRetries(3, 1) { calls += 1; if (calls < 3) sys.error("boom"); 42 }
    assert(got == 42 && calls == 3)
    intercept[RuntimeException] {
      Sinks.withRetries(2, 1) { sys.error("always") }
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary feature extraction is deterministic and partition-agnostic") {
    val df = (1L to 20L).map(i => (i, s"payload-$i".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val a = Multimodal.extractFeatures(df.repartition(1)).orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(df.repartition(7)).orderBy("media_id").collect()
    assert(a.length == 20)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.forall(_.getSeq[Float](3).length == 8))
  }

  test("media near-dups: identical payloads pair at cosine 1, others don't") {
    val bytes = "same-payload".getBytes("UTF-8")
    val df = Seq((1L, bytes), (2L, bytes),
      (3L, "different!".getBytes("UTF-8"))).toDF("media_id", "content")
    val pairs = Multimodal.mediaNearDups(df, 0.999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("frame sampler slices payload bytes with stride") {
    val payload = (0 until 100).map(_.toByte).toArray
    val df = Seq(Tuple1(payload)).toDF("content")
    val frames = df.select(Multimodal.frameSample("content", frameSize = 10, stride = 2)
      .as("f")).head().getSeq[Array[Byte]](0)
    assert(frames.length == 5) // frames 0,2,4,6,8 of 10
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (20 until 30).map(_.toByte))
  }

  test("resize metadata clamps the longer edge") {
    val df = Seq((1L, "png", 2000, 1000)).toDF("id", "format", "width", "height")
      .select(col("id"), struct(col("format"), col("width"), col("height")).as("meta"))
    val r = df.select(Multimodal.resizeMeta(col("meta"), 512).as("m"))
      .select("m.width", "m.height").head()
    assert(r.getInt(0) == 512 && r.getInt(1) == 256)
  }
}

class ControlPlaneSpec extends SparkSpec {

  test("job lifecycle: submit → running → finished with status (C1/C2)") {
    val reg = new JobRegistry(spark)
    val id = reg.submit("count") { s =>
      assert(Tables.lineitem(s, "/root/testdata/sf0.001").count() > 0)
    }
    val deadline = System.currentTimeMillis() + 60000
    while (System.currentTimeMillis() < deadline &&
      !reg.status(id).exists(_.state == reg.Finished)) Thread.sleep(100)
    assert(reg.status(id).exists(_.state == reg.Finished))
    reg.shutdown()
  }

  test("failing job reports Failed with the error (C2)") {
    val reg = new JobRegistry(spark)
    val id = reg.submit("boom")(_ => sys.error("expected failure"))
    val deadline = System.currentTimeMillis() + 60000
    while (System.currentTimeMillis() < deadline &&
      !reg.status(id).exists(_.state.isInstanceOf[reg.Failed])) Thread.sleep(100)
    val st = reg.status(id).get.state
    assert(st.asInstanceOf[reg.Failed].error.contains("expected failure"))
    reg.shutdown()
  }

  test("cancel interrupts a running job group (C3)") {
    val reg = new JobRegistry(spark)
    val id = reg.submit("slow") { s =>
      import s.implicits._
      // a genuinely long Spark job: many slow partitions
      s.range(0, 1000000000L, 1, 256)
        .mapPartitions { it => Thread.sleep(200); it }
        .selectExpr("sum(value)").collect()
      ()
    }
    // wait until the Spark job is actually registered and running, so
    // cancelJobGroup has something to interrupt
    val deadline = System.currentTimeMillis() + 30000
    while (System.currentTimeMillis() < deadline &&
      !(reg.status(id).exists(_.state == reg.Running) &&
        spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty))
      Thread.sleep(50)
    assert(reg.cancel(id), s"cancel rejected; state=${reg.status(id).map(_.state)}")
    val dl2 = System.currentTimeMillis() + 60000
    while (System.currentTimeMillis() < dl2 &&
      !reg.status(id).exists(j => j.state == reg.Cancelled)) Thread.sleep(100)
    assert(reg.status(id).exists(_.state == reg.Cancelled),
      s"state=${reg.status(id).map(_.state)}")
    reg.shutdown()
  }
}
