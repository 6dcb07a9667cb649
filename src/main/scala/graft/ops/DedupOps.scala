package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps.h64

/** Deduplication operator family for training-data pipelines: exact
  * (content hash), n-gram Jaccard, MinHash+LSH, SimHash. All stay
  * DataFrame-native — candidate generation is always a key-equality
  * join (shingle / band bucket / simhash prefix), never an O(n²)
  * cross join, so the plans scale to billions of documents.
  */
object DedupOps {

  /** Caches handed out by the candidate generators below, drained
    * (unpersisted) at the start of the next invocation so a long-lived
    * session doesn't accumulate executor storage memory. Unpersisting a
    * result another consumer still holds is safe — Spark recomputes —
    * so the worst case for interleaved use is lost caching, not
    * wrong answers. */
  private val liveCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  private def cacheTracked(df: DataFrame): DataFrame = {
    val c = df.cache(); liveCaches.add(c); c
  }

  /** Release caches created by prior jaccardPairs/lshCandidates calls. */
  def releaseCaches(): Unit = {
    var prev = liveCaches.poll()
    while (prev != null) { prev.unpersist(false); prev = liveCaches.poll() }
  }

  /** Exact dedup by content hash: one representative (min id) per
    * distinct text, with the duplicate count. A single hash-aggregate
    * with map-side partial combine — the 100 TB-safe form of
    * `dropDuplicates(text)` (hash keys shuffle, texts don't need to). */
  def exactDedup(df: DataFrame, id: String, text: String): DataFrame =
    df.select(h64(col(text)).as("content_hash"), col(id))
      .groupBy("content_hash")
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Per-document distinct shingle sets, exploded long. */
  private def shingleRows(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id).as("doc"), explode(TextOps.shingles(col(text), n)).as("s"))

  /** n-gram Jaccard near-dup pairs: candidates share ≥1 shingle (an
    * equi-join on the shingle — inverted-index semantics), exact
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|) from distinct-shingle counts.
    *
    * Scale notes: the shingle join is the standard candidate generator;
    * the skew risk is ultra-common shingles — `maxDocFreq` drops
    * shingles appearing in more than that many documents (boilerplate
    * stop-shingles), which both de-skews the join and removes
    * meaningless candidates. AQE skew-join handles the residual.
    */
  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int,
                   threshold: Double, maxDocFreq: Option[Long] = None): DataFrame = {
    // join on the 60-bit shingle hash, not the string — smaller shuffle
    // keys, cheaper equality; 60 bits ⇒ collisions are negligible
    // cached: feeds sizes + both sides of the candidate self-join
    releaseCaches()
    val sh = cacheTracked(shingleRows(df, id, text, n)
      .select(col("doc"), h64(col("s")).as("s")))
    val filtered = maxDocFreq match {
      case Some(cap) =>
        val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
        sh.join(freq.filter(col("df") <= cap).select("s"), Seq("s"))
      case None => sh
    }
    val sizes = filtered.groupBy("doc").agg(count(lit(1)).as("sz"))
    val a = filtered.toDF("doc_a", "s")
    val b = filtered.toDF("doc_b", "s")
    a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("doc_a", "sz_a"), Seq("doc_a"))
      .join(sizes.toDF("doc_b", "sz_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** MinHash signatures, k components, via a universal-hash family:
    * one md5-derived base hash per shingle, then k affine rehashes
    * sig_i = (a_i·h + b_i) mod (2³¹−1) with content-derived odd a_i —
    * k× fewer cryptographic hashes than hashing (i, shingle) pairs
    * (the dominant cost at scale). 31-bit components keep the affine
    * arithmetic exactly representable in 64-bit on every engine.
    * Long format (doc, i, sigv) — one shuffle on (doc, i) with
    * map-side partial min. */
  val MinhashMod = 2147483647L // 2^31 - 1, prime

  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = math.abs(("a:" + i).hashCode.toLong) % (MinhashMod - 2) + 1
      val b = math.abs(("b:" + i).hashCode.toLong) % MinhashMod
      (a, b)
    }

  def minhashSignature(df: DataFrame, id: String, text: String, k: Int,
                       shingleN: Int = 3): DataFrame = {
    val params = minhashParams(k)
    val abPairs = array(params.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("i"), lit(a).as("a"), lit(b).as("b"))
    }: _*)
    shingleRows(df, id, text, shingleN)
      .withColumn("h", pmod(h64(col("s")), lit(MinhashMod)))
      .withColumn("p", explode(abPairs))
      .groupBy(col("doc"), col("p.i").as("i"))
      .agg(min(pmod(col("p.a") * col("h") + col("p.b"), lit(MinhashMod))).as("sigv"))
  }

  /** LSH banding over a minhash signature: band hash = h64 of the
    * concatenated r signature components. Docs sharing any (band,
    * band_hash) bucket are candidates — the join is on the bucket key,
    * never all-pairs. */
  def lshBands(sig: DataFrame, r: Int): DataFrame =
    sig.withColumn("band", floor(col("i") / r))
      .groupBy("doc", "band")
      .agg(h64(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("sigv")))),
          p => p.getField("sigv")))).as("bh"))

  /** Candidate pairs from LSH buckets + estimated Jaccard (fraction of
    * matching signature components). */
  def lshCandidates(sig: DataFrame, k: Int, r: Int): DataFrame = {
    // sig and bands each feed two join sides — cache them, or the full
    // shingle→md5 signature DAG is recomputed four times
    releaseCaches()
    val sigC = cacheTracked(sig)
    val bands = cacheTracked(lshBands(sigC, r))
    val cand = bands.toDF("doc_a", "band", "bh")
      .join(bands.toDF("doc_b", "band", "bh"), Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sigC.toDF("doc_a", "i", "sig_a"), Seq("doc_a"))
      .join(sigC.toDF("doc_b", "i", "sig_b"), Seq("doc_b", "i"))
      .groupBy("doc_a", "doc_b")
      .agg((sum(when(col("sig_a") === col("sig_b"), 1).otherwise(0)) / k.toDouble)
        .as("est_jaccard"))
  }

  /** 48-bit SimHash over tokens (with multiplicity): bit j is 1 when the
    * sum over token hashes of ±1 (by bit j of h64(token)) is positive.
    * 48 bits keeps every shift inside a positive bigint. Fully
    * aggregate-based: explode(tokens × bits) → sum → reassemble. */
  def simhash(df: DataFrame, id: String, text: String, bits: Int = 48): DataFrame =
    df.select(col(id).as("doc"), explode(TextOps.tokens(col(text))).as("t"))
      .withColumn("h", h64(col("t")))
      .withColumn("j", explode(sequence(lit(0), lit(bits - 1))))
      .groupBy("doc", "j")
      .agg(sum(when(expr("(shiftright(h, j) & 1) = 1"), 1)
        .otherwise(-1)).as("sc"))
      .groupBy("doc")
      .agg(sum(when(col("sc") > 0, expr("shiftleft(1L, j)"))
        .otherwise(0L)).as("simhash"))

  /** SimHash near-dup pairs by Hamming distance. Candidate generation
    * here is the plain self-join for oracle parity; the scale path is
    * the standard multi-index trick (split the fingerprint into
    * `maxHamming+1` segments, join on segment equality) — see
    * `simhashPairsBanded`. */
  def simhashPairs(simh: DataFrame, maxHamming: Int): DataFrame =
    simh.toDF("doc_a", "sh_a").join(simh.toDF("doc_b", "sh_b"),
        col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")

  /** Scale form of simhashPairs: pigeonhole banding. Split the b-bit
    * fingerprint into (maxHamming+1) segments; any pair within the
    * Hamming budget must agree exactly on ≥1 segment, so candidates
    * come from equi-joins on (segment index, segment bits) — linear
    * candidate generation instead of the quadratic cross join. */
  def simhashPairsBanded(simh: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    val nSeg = maxHamming + 1
    val segLen = math.max(1, bits / nSeg)
    val segs = simh.select(col("doc"), col("simhash"),
        explode(sequence(lit(0), lit(nSeg - 1))).as("seg"))
      .withColumn("segbits",
        expr(s"shiftright(simhash, seg * $segLen) & ${(1L << segLen) - 1}"))
    val cand = segs.select(col("doc").as("doc_a"), col("simhash").as("sh_a"),
        col("seg"), col("segbits"))
      .join(segs.select(col("doc").as("doc_b"), col("simhash").as("sh_b"),
        col("seg"), col("segbits")), Seq("seg", "segbits"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
    cand.withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
