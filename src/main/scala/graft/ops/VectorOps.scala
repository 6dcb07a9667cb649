package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators: brute-force cosine top-k as
  * the exact baseline, and sign-random-projection LSH bucketing as the
  * scale path (candidates from a bucket equi-join, then exact re-rank).
  *
  * Vectors are `array<float>` columns cast to double for the math; dot
  * products are `aggregate(zip_with(...))` — pure Catalyst expressions,
  * codegen'd, no UDFs.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: each query row is scored against every
    * candidate. The query side is broadcast (queries are the small
    * side), candidates stream by partition, and the per-query top-k is
    * a window rank — so the heavy side never shuffles beyond the rank's
    * hash partitioning on query id. Exact; O(|Q|·|C|) compute. */
  def cosineTopK(queries: DataFrame, candidates: DataFrame, id: String,
                 vec: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val c = candidates.select(col(id).as("cand_id"), asDouble(col(vec)).as("cv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("cand_id") else lit(true))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, pairwise;
    * for scale, run `lshBuckets` first and only pair within buckets). */
  def cosineNearDup(df: DataFrame, id: String, vec: String,
                    threshold: Double): DataFrame = {
    val a = df.select(col(id).as("vec_a"), asDouble(col(vec)).as("va"))
    val b = df.select(col(id).as("vec_b"), asDouble(col(vec)).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * md5-derived integer uniform in [-1e6, 1e6]. Integer weights (and a
    * fixed-point vector quantization below) make the projection sign an
    * exact integer computation — identical across engines, partitionings
    * and summation orders, which a reproducible bucketing needs. */
  def planeWeight(plane: Column, dim: Column): Column =
    TextOps.h64(concat(plane, lit(","), dim)) % 2000001L - 1000000L

  /** Sign-random-projection LSH bucket id: bit p = (v · r_p > 0) for
    * `planes` hyperplanes → an integer bucket. The dot product runs in
    * fixed point: round(x·1e6) · w, summed as bigints (exact, order-
    * independent). Vectors in the same bucket are cosine-similar
    * candidates; the bucket join is linear. */
  def lshBuckets(df: DataFrame, id: String, vec: String, planes: Int): DataFrame = {
    val v = df.select(col(id).as("vid"), asDouble(col(vec)).as("v"))
    v.select(col("vid"), col("v"),
        explode(sequence(lit(0), lit(planes - 1))).as("p"))
      .select(col("vid"), col("p"),
        aggregate(zip_with(col("v"),
            transform(sequence(lit(0), size(col("v")) - 1),
              d => planeWeight(col("p"), d)),
            (x, w) => round(x * 1000000.0).cast("long") * w),
          lit(0L), (acc, x) => acc + x).as("proj"))
      .groupBy("vid")
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1L, p)"))
        .otherwise(0L)).as("bucket"))
  }

  /** ANN top-k via LSH buckets: candidates share the query's bucket,
    * then exact cosine re-rank. Trades recall for a linear candidate
    * join — the 100 TB path (brute force is the correctness oracle). */
  def annTopK(df: DataFrame, id: String, vec: String, planes: Int,
              k: Int, queryPred: Column): DataFrame = {
    val buckets = lshBuckets(df, id, vec, planes)
    val withB = df.select(col(id), asDouble(col(vec)).as("v"))
      .join(buckets, col(id) === col("vid")).drop("vid")
    val q = withB.filter(queryPred)
      .select(col(id).as("query_id"), col("v").as("qv"), col("bucket"))
    val c = withB.select(col(id).as("cand_id"), col("v").as("cv"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }
}
