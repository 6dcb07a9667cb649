package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory so correctness (sf0.01) and
  * bench (sf0.1) runs read the same code path. Parquet scans get column
  * pruning + predicate pushdown from Catalyst for free; every operator
  * downstream should `select` only what it needs so the pruning reaches
  * the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * long (`spark.sql.legacy.parquet.nanosAsLong=true`, set in every
    * session we build). Convert to a proper microsecond TimestampType here
    * so downstream operators are idiomatic; integer division truncates,
    * matching DuckDB's TIMESTAMP_NS → TIMESTAMP cast. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div`, not `/`: long/long is DOUBLE division in Spark, and at
        // ~1.7e18 ns doubles lose sub-microsecond precision
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view so the full `spark.sql` text
    * surface (including the custom keccak256 / abi_decode_* / vec_dot
    * functions the session extensions install) works against them. */
  def registerViews(s: SparkSession, d: String): Unit = {
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else apply(s, d, n)
      df.createOrReplaceTempView(n)
    }
  }
}
