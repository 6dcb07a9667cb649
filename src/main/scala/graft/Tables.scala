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
  /** `events.ts` arrives in whatever physical type the generator used —
    * TIMESTAMP(NANOS) (read as long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) or tz-naive
    * timestamp[us] (read as TIMESTAMP_NTZ). Normalize both to session-tz
    * TimestampType so every downstream operator (`unix_micros`, window
    * ranges, `date_trunc`) sees one type. The session tz is pinned UTC,
    * so the NTZ→LTZ cast preserves the wall-clock values DuckDB reads. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // `div`, not `/`: long/long is DOUBLE division in Spark, and at
        // ~1.7e18 ns doubles lose sub-microsecond precision
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
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
