package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify / Bench / tests agree.
  *
  * - shuffle partitions sized for local[N] (not the 200 default);
  * - AQE on (runtime coalescing + skew-join handling — the knobs that
  *   matter unchanged on a real cluster);
  * - UTC session tz for oracle parity;
  * - nanosAsLong kept for TIMESTAMP(NANOS) dumps (older testdata
  *   generations; current `events.ts` is tz-naive micros — Tables.events
  *   normalizes either encoding to session-tz TimestampType).
  */
object GraftSession {
  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(graft.evm.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
