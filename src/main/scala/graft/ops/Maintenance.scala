package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Table-maintenance operators: the OPTIMIZE-style Z-order compaction
  * that turns [[DataQueries.zorderLayout]]'s telemetry into an action.
  *
  * A long-running ingest leaves a table as thousands of small
  * arrival-ordered files whose footer (min,max) ranges are useless for
  * skipping (every file spans every day). Compaction rewrites the
  * table as a bounded number of Z-clustered files: range-partition on
  * the Morton value (one sampling pass — NO global sort), sort within
  * each partition, one file per partition. Each footer then bounds
  * BOTH probe dimensions, and a 2-d box read touches O(box) files —
  * the read-amplification win `q_zorder` prices stays available after
  * the rewrite because the rewrite is content-neutral, which is
  * exactly what `q_compact`'s oracle proves cross-engine.
  *
  * At 100 TB: `repartitionByRange` is one shuffle of the table being
  * compacted (unavoidable — compaction IS a rewrite), the range
  * boundaries come from a driver-side sample, and nFiles scales with
  * table-size/target-file-size, not with cluster size. */
object Maintenance {

  /** Rewrite `events`-shaped rows as `nFiles` Z-clustered parquet
    * files at `outPath` (Morton-interleaved user_id × day bits, the
    * shared [[DataQueries.mortonExpr]] spelling). Returns nothing; the
    * output directory is the artifact. */
  def compactEventsZorder(events: DataFrame, outPath: String,
                          nFiles: Int): Unit =
    events
      .withColumn("dayn",
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
      .withColumn("__z", expr(DataQueries.mortonExpr))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "dayn")
      .write.mode("overwrite").parquet(outPath)

  /** Declared-query face of compaction: compact the events table into
    * a session-temp directory, read the COMPACTED files back, and
    * return per-type content aggregates. The oracle computes the same
    * aggregates from the ORIGINAL table — equality is the
    * content-neutrality proof (a compaction that drops, duplicates, or
    * corrupts rows cannot pass). File-count and probe-locality
    * assertions are filesystem-dependent and live in MaintenanceSpec
    * instead. */
  def compactReport(s: SparkSession, d: String): DataFrame = {
    // per-invocation UUID, not a hash of the path: hashCode collisions
    // (or two sessions compacting different datasets concurrently)
    // must never share a tmp dir — an interleaved overwrite-write and
    // read-back would report another dataset's content. The dir must
    // outlive this call (the returned frame reads it lazily).
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_compact_" +
      java.util.UUID.randomUUID().toString
    compactEventsZorder(Tables.events(s, d), out, 8)
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("cast(round(value * 1e6) as bigint)")).as("sum_vmicro"),
        min("event_id").as("min_id"),
        max("event_id").as("max_id"),
        sum(col("user_id")).as("sum_user"))
      .orderBy("event_type")
  }
}
