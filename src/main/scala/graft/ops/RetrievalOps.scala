package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sparse lexical retrieval over the corpus — the BM25 ranking behind
  * RAG / benchmark-retrieval / hard-negative-mining stages of a
  * training-data pipeline.
  *
  * Cross-engine exactness: the per-(query, doc, term) partial score is
  * quantized to integer micro-units with a structurally identical
  * floating expression on both engines (same literal constants, same
  * association order; `ln` and `/` are correctly rounded on both), and
  * the per-document total is a SUM of longs — independent of partition
  * accumulation order. Residual risk is the tempMix class (a partial
  * landing within 1 ulp of a .5 micro-unit boundary could round apart);
  * green at all three scale factors, and the failure mode is a visible
  * hash-red row.
  */
object RetrievalOps {

  /** The benchmark query set: tiny, fixed, and engine-shared (mirrored
    * as literal VALUES rows in the oracle SQL). */
  val QuerySet: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "join", 1 -> "window",
    2 -> "hash", 2 -> "merge", 2 -> "batch",
    3 -> "customer", 3 -> "order", 3 -> "query",
    4 -> "vector", 4 -> "scan", 4 -> "filter")

  /** Okapi BM25 top-k per query (k1=1.2, b=0.75, Lucene-style
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) which is ≥ 0 always).
    *
    * Scale shape: the corpus token stream is semi-joined against the
    * BROADCAST query vocabulary BEFORE anything shuffles, so the tf
    * aggregation only ever moves rows whose term appears in some query
    * — the classic inverted-index probe, not a corpus-wide index build.
    * Document length (`dl`) is computed columnar in the same scan and
    * rides the surviving rows; `N`/`avgdl` are one broadcast 1-row
    * aggregate; `df` over the query vocabulary is query-set-sized and
    * broadcast. The only data-sized shuffles are the tf groupBy on the
    * filtered stream and the final per-query top-k window (keyed by
    * query_id — bounded stratum count; at huge query sets, swap the
    * window for a per-query aggregate top-k). */
  def bm25TopK(s: SparkSession, d: String, topK: Int = 5): DataFrame =
    bm25TopKOf(Tables.documents(s, d), QuerySet, topK)

  /** BM25 over an arbitrary `(doc_id, text)` frame — the fixture-
    * testable core behind [[bm25TopK]]. */
  def bm25TopKOf(docs: DataFrame, querySet: Seq[(Int, String)],
                 topK: Int = 5): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val q = querySet.toDF("query_id", "term")
    // N and avgdl: columnar token count, one 1-row aggregate (lazy —
    // no construction-time driver action), broadcast into the score
    val stats = docs.select(TextOps.tokenCount(col("text")).as("dl0"))
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col("dl0").cast("double")).as("__avgdl"))
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode_outer(col("tk")).as("term"))
      .filter(col("term").isNotNull)
    val hits = toks.join(broadcast(q.select("term").distinct()), Seq("term"))
    val tf = hits.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // document frequency as a window over the (small) tf table — one
    // exchange of query-term-sized data, instead of a broadcast whose
    // subtree would re-run the corpus explode a second time
    val scored = tf
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
      .join(broadcast(q), Seq("term"))
      .crossJoin(broadcast(stats))
      // association order mirrored EXACTLY by the oracle SQL
      .withColumn("s_fx",
        round(lit(1000000.0)
          * log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("__avgdl"))), 0)
          .cast("long"))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("s_fx")).as("score_fx"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_fx").desc, col("doc_id").asc)
    perDoc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("n_terms"),
        round(col("score_fx") / 1e6, 6).as("bm25"))
      .orderBy("query_id", "rnk")
  }

  /** Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical
    * top-`kEach` and a dense cosine top-`kEach` (query vector = the
    * embedding whose vec_id equals the query_id, over the shared
    * doc_id↔vec_id key space) merge with the standard RRF score
    * `Σ 1/(60 + rank)` — here in exact integer micro-units
    * (`1000000 div (60 + r)`), so fusion, ties and the final ranking
    * are engine-identical with no float in sight. A doc ranked by only
    * one side contributes only that side (full-outer merge) — exactly
    * the partial-coverage case of a dense index that lags the lexical
    * one (sf0.1 ships 5000 docs but only 2000 embeddings).
    *
    * Scale shape: both legs end in per-query top-`kEach` lists (query
    * count × kEach rows — telemetry-sized), so the fusion join and
    * final window cost nothing; the heavy lifting is the legs
    * themselves, which keep their documented inverted-probe /
    * broadcast-queries shapes. */
  def hybridRrf(s: SparkSession, d: String, kEach: Int = 20,
                topK: Int = 5): DataFrame = {
    val lex = bm25TopKOf(Tables.documents(s, d), QuerySet, kEach)
      .select(col("query_id").cast("long").as("query_id"),
        col("doc_id"), col("rnk").as("r_lex"))
    val emb = Tables.embeddings(s, d)
    val dense = VectorOps.cosineTopK(
        emb.filter(col("vec_id").between(1, 4)), emb, "vec_id", "embedding",
        kEach)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        col("rank").as("r_dense"))
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_fx",
        coalesce(expr("1000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + r_dense)"), lit(0L)))
      .withColumn("n_src",
        col("r_lex").isNotNull.cast("int") +
          col("r_dense").isNotNull.cast("int"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_fx").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= topK)
      .select("query_id", "rnk", "doc_id", "rrf_fx", "n_src")
      .orderBy("query_id", "rnk")
  }
}
