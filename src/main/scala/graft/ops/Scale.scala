package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques as reusable operators (SURVEY.md §4 / the 100 TB
  * posture): two-phase salted aggregation for skewed keys, and helpers
  * for shuffle-free co-located joins over bucketed tables. AQE covers
  * the common cases at runtime; these are the explicit levers for when
  * the skew is known up front (one hot contract, one boilerplate
  * shingle, one whale wallet).
  */
object Scale {

  /** Two-phase aggregation with salting: partial-aggregate on
    * (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * then final-aggregate on the key. Correct for any algebraic
    * aggregate expressed as (partial, merge) column pairs.
    *
    * Example: salted count+sum
    * {{{
    * Scale.saltedAgg(df, Seq("k"), 16)(
    *   Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)
               (partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Persist a DataFrame as a bucketed, sorted managed table — joins
    * and aggregations on the bucket key(s) then need no shuffle (the
    * pre-partitioning the reference can't express; Spark's bucketing
    * is the cluster-wide equivalent of its per-file layout). Both sides
    * of a recurring batch↔corpus-state join (LSH band index, signature
    * store, chunk table) written with the same (cols, numBuckets)
    * layout join with zero exchanges. Sort columns default to the
    * bucket columns so SortMergeJoin also skips its sort. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, moreBucketCols: Seq[String] = Nil,
                    sortCols: Seq[String] = Nil): Unit = {
    val sort = if (sortCols.nonEmpty) sortCols else bucketCol +: moreBucketCols
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol, moreBucketCols: _*)
      .sortBy(sort.head, sort.tail: _*)
      .saveAsTable(table)
  }

  /** True when the physical plan contains no shuffle exchange — the
    * assertion that a bucketed join was actually co-located. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Persist a DataFrame as a directory-partitioned managed table —
    * the 100 TB layout lever orthogonal to [[writeBucketed]]:
    * bucketing co-locates JOINS on high-cardinality keys; directory
    * partitioning lets both static filters and runtime dynamic
    * partition pruning (DPP) skip whole partitions of a fact scan when
    * a dimension-side filter narrows the partition key at execution
    * time. Low-cardinality keys only (day, event_type, lang) — one
    * directory per value. */
  def writePartitioned(df: DataFrame, table: String, partCol: String,
                       morePartCols: String*): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCol +: morePartCols: _*)
      .format("parquet")
      .saveAsTable(table)
}
