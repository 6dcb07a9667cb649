package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextOps

/** Model-based document quality filtering — the "distill the rule gate
  * into a classifier" stage of a training-data pipeline (CCNet/LLaMA-
  * style: a cheap model generalizes a hand-written gate to content the
  * rules don't directly cover).
  *
  * Features are hashed unigram counts (feature hashing, Weinberger et
  * al. 2009): bucket = h64(term) mod 64 — vocabulary-free, so the
  * featurizer is a fixed-width map-side projection at any corpus size.
  * The training label is the Gopher rule gate itself; training happens
  * OFFLINE (LBFGS via spark.ml, exported by [[PinQuality]]) and serving
  * is pure integer column arithmetic over micro-unit weight literals:
  * logit_fx = b_fx + Σ w_fx(bucket)·cnt(bucket) — sums of longs, so the
  * DuckDB oracle replays scoring bit-for-bit. Keep/drop thresholds in
  * LOGIT space (logit ≥ 0 ⟺ p ≥ 0.5) — no exp(), whose last-ulp
  * behavior differs across libms.
  */
object QualityClassifier {

  /** Hashed feature dimensionality. 64 keeps the pinned weight table a
    * readable literal in both Scala and the oracle SQL; the operator
    * shape is identical at 2^18 buckets (the weight side stays a
    * broadcast joined on the bucket key). */
  val Dim = 64

  /** (doc_id, bucket, cnt) hashed unigram counts — one narrow shuffle
    * keyed by (doc_id, bucket); document text never leaves the scan. */
  def hashedCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode_outer(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term").isNotNull)
      .select(col("doc_id"), (TextOps.h64(col("term")) % Dim).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))

  /** Rule-gate labels: 1 = Gopher keep. */
  def labeled(docs: DataFrame): DataFrame = {
    val (nW, mL, aF, sH) = TextOps.gopherSignals(col("text"))
    docs.select(col("doc_id"),
      TextOps.gopherKeep(nW, mL, aF, sH).cast("int").as("y"))
  }

  /** Offline fit: dense 64-dim count vectors → L2-regularized logistic
    * regression. Only [[PinQuality]] and the drift spec call this —
    * serving never touches spark.ml. */
  def fitWeights(s: SparkSession, d: String): (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val docs = Tables.documents(s, d)
    val m = hashedCounts(docs).groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt"))))
        .as("m"))
    val arr = m.select(col("doc_id"),
      transform(sequence(lit(0), lit(Dim - 1)),
        i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))
          .cast("double")).as("f"))
    val ds = arr.join(labeled(docs), Seq("doc_id"))
      .select(col("y").cast("double").as("label"),
        array_to_vector(col("f")).as("features"))
      .coalesce(4) // tiny train set; don't schedule 32 near-empty tasks per LBFGS pass
    val lr = new LogisticRegression()
      .setMaxIter(200).setTol(1e-7).setRegParam(1e-3)
    val fit = lr.fit(ds)
    (fit.coefficients.toArray, fit.intercept)
  }

  /** Pinned-model scoring beside the rule gate it was distilled from:
    * per-doc logit, model keep (logit ≥ 0), rule keep, agreement flag.
    * One broadcast join against the 64-row weight table, one narrow
    * (doc, bucket) aggregation, one doc-keyed join back to the
    * rule-signal projection. */
  def scorePinned(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val wdf = PinnedQualityModel.WFx.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("bucket", "w_fx")
    val dot = hashedCounts(docs).join(broadcast(wdf), Seq("bucket"))
      .groupBy("doc_id").agg(sum(col("w_fx") * col("cnt")).as("dot_fx"))
    val (nW, mL, aF, sH) = TextOps.gopherSignals(col("text"))
    docs.select(col("doc_id"), col("source"),
        TextOps.gopherKeep(nW, mL, aF, sH).as("keep_rule"))
      .join(dot, Seq("doc_id"), "left")
      .withColumn("logit_fx",
        lit(PinnedQualityModel.BFx) + coalesce(col("dot_fx"), lit(0L)))
      .select(col("doc_id"), col("source"),
        round(col("logit_fx") / 1e6, 6).as("logit"),
        (col("logit_fx") >= 0L).as("keep_model"),
        col("keep_rule"),
        ((col("logit_fx") >= 0L) === col("keep_rule")).as("agree"))
  }

  /** Map-only logit: the 64 micro-unit weights as a LITERAL array
    * indexed per token instance — Σ w[h64(t) mod 64] + b over the token
    * array is algebraically identical to the batch join's Σ w·cnt, and
    * every step is integer, so the two forms are bit-equal. Because
    * there is no aggregation, the plan is stateless: it runs unchanged
    * in a Structured Streaming micro-batch (no state store, no
    * watermark). The literal-array form is the small-Dim special case
    * of the broadcast weight join [[scorePinned]] uses. */
  def logitFxMapOnly(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = typedLit(PinnedQualityModel.WFx.toSeq)
    lit(PinnedQualityModel.BFx) +
      coalesce(aggregate(TextOps.tokens(textCol), lit(0L),
        (acc, t) =>
          acc + element_at(w, ((TextOps.h64(t) % Dim) + 1).cast("int"))),
        lit(0L))
  }

  /** Streaming (or batch) quality scoring over `(doc_id, text)` rows —
    * one artifact, two runtimes; a spec pins equality with the batch
    * join form. */
  def scoreStream(docs: DataFrame): DataFrame =
    docs.withColumn("__fx", logitFxMapOnly(col("text")))
      .select(col("doc_id"), round(col("__fx") / 1e6, 6).as("logit"),
        (col("__fx") >= 0L).as("keep_model"))

  /** Per-doc serving query (oracled). */
  def qualityModel(s: SparkSession, d: String): DataFrame =
    scorePinned(s, d)
      .select("doc_id", "logit", "keep_model", "keep_rule", "agree")
      .orderBy("doc_id")

  /** Distillation telemetry: per-source agreement of the model with the
    * rule gate — the monitor that catches feature drift between the
    * corpus the model was distilled on and the corpus being scored. */
  def qualityAgreement(s: SparkSession, d: String): DataFrame =
    scorePinned(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("agree").cast("long")).as("n_agree"),
        sum(col("keep_model").cast("long")).as("n_keep_model"),
        sum(col("keep_rule").cast("long")).as("n_keep_rule"))
      .withColumn("agree_rate",
        round(col("n_agree").cast("double") / col("n_docs"), 6))
      .orderBy("source")
}

/** Pinned quality-model artifact in integer micro-units (w·1e6,
  * rounded). Provenance: [[PinQuality]] main — LBFGS fit of
  * [[QualityClassifier.fitWeights]] on sf0.01. Integer literals are
  * trivially engine-identical (no decimal-parse concerns at all). */
object PinnedQualityModel {
  val WFx: Array[Long] = Array(
    166063L, 0L, 0L, 0L, 123919L, 0L, 0L, -140606L,
    0L, -9184L, -66551L, 0L, 0L, 0L, 0L, 0L,
    0L, 27390L, 258598L, 0L, 0L, 0L, 0L, 52354L,
    -208675L, -1884L, 0L, 0L, 0L, 15684L, -291614L, 0L,
    0L, 73403L, -70947L, 0L, 70928L, 0L, 0L, 0L,
    0L, 53333L, 481421L, 0L, -35958L, 1369519L, -86090L, 0L,
    0L, 0L, 0L, 235495L, 51009L, 0L, 0L, 0L,
    0L, 0L, 191791L, 0L, 0L, 0L, 0L, 40768L)
  val BFx: Long = -3963416L
}

/** Offline exporter: prints the micro-unit weight literals to pin into
  * [[PinnedQualityModel]]. Run:
  *   sbt 'runMain graft.ml.PinQuality /root/testdata/sf0.01'
  */
object PinQuality {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.GraftSession.build(cpus)
    val (w, b) = QualityClassifier.fitWeights(spark, dir)
    println("QUALITY_W_FX=" + w.map(x => math.round(x * 1e6)).mkString(","))
    println("QUALITY_B_FX=" + math.round(b * 1e6))
    spark.stop()
  }
}
