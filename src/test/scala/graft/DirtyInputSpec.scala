package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, VectorOps}

/** Dirty-input robustness (found by the 5x-replicated stress corpus):
  * ANSI mode turns a zero denominator into a job-killing exception, so
  * every operator ratio must be total over its real input domain —
  * duplicate ids inflate Jaccard intersections past the set sizes, and
  * zero-norm embeddings have no cosine. */
class DirtyInputSpec extends SparkSpec {
  import spark.implicits._

  test("jaccardPairs survives duplicate doc ids (union size can hit 0)") {
    // doc 1 appears twice, doc 2 once, identical text: inter(1,2) = 2k
    // while sz_a + sz_b = 2k — exactly the zero denominator
    val t = "alpha beta gamma delta epsilon"
    val df = Seq((1L, t), (1L, t), (2L, t)).toDF("doc_id", "text")
    val out = DedupOps.jaccardPairs(df, "doc_id", "text", 3, 0.1).collect()
    // degenerate pair falls out via the null jaccard, no exception
    assert(out.isEmpty)
  }

  test("passage stats: whitespace-only and empty docs drop out cleanly") {
    val df = Seq((1L, "   "), (2L, ""), (3L, "real tokens present here"))
      .toDF("doc_id", "text")
    val out = DedupOps.passageStats(df, "doc_id", "text", w = 4).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L)) // no 0-chunk rows, no throw
  }

  test("lm score: empty corpus yields empty output, no scalar-probe crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.DataQueries.lmScoreOf(empty).count() == 0)
  }

  test("chunkDocs: empty/whitespace docs drop; short docs get one chunk") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one"),
        (4L, Seq.tabulate(130)(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.chunkDocs(df, "doc_id", "text", 64, 48)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 3: single 1-token chunk; doc 4 (130 tokens): starts 0/48/96 →
    // lengths 64/64/34 — the truncated tail is kept, never padded
    assert(out.toSet == Set((3L, 0, 1), (4L, 0, 64), (4L, 1, 64), (4L, 2, 34)))
  }

  test("editNearDup: identical texts under duplicate-heavy input, sim=1") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, t), (2L, t), (3L, "completely different words " * 3))
      .toDF("doc_id", "text")
    val out = DedupOps.editNearDup(df, "doc_id", "text",
        k = 32, r = 2, prefixLen = 256, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 0, 1.0)))
  }

  test("lshIncremental: empty batch or empty corpus yield empty, no errors") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DedupOps.lshIncremental(docs, empty, "doc_id", "text", 32, 2, 0.3)
      .count() == 0)
    assert(DedupOps.lshIncremental(empty, docs, "doc_id", "text", 32, 2, 0.3)
      .count() == 0)
  }

  test("lshIncremental finds an exact duplicate across sides at est 1.0") {
    val t = "one two three four five six seven eight nine ten"
    val corpus = Seq((1L, t), (2L, "totally different words here entirely"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, t)).toDF("doc_id", "text")
    val got = DedupOps.lshIncremental(corpus, batch, "doc_id", "text", 32, 2, 0.3)
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 10L && got(0).getLong(1) == 1L)
    assert(got(0).getDouble(2) == 1.0)
  }

  test("containment flags an excerpt that symmetric Jaccard misses") {
    val quote = "the quick brown fox jumps over the lazy dog again"
    val long = (1 to 12).map(i => s"filler$i word$i more$i").mkString(" ") +
      " " + quote + " " + (13 to 24).map(i => s"tail$i other$i").mkString(" ")
    val df = Seq((1L, quote), (2L, long)).toDF("doc_id", "text")
    val cont = DedupOps.containmentPairs(df, "doc_id", "text", 3, 4, 0.5)
      .collect()
    assert(cont.length == 1, "excerpt pair not found")
    val r = cont(0)
    assert(r.getAs[Double]("cont_a") >= 0.5, s"cont_a: $r") // quote in long
    // while the symmetric jaccard stays below the usual 0.1 pair gate
    val jac = DedupOps.winnowPairs(df, "doc_id", "text", 3, 4, minShared = 1)
      .collect()(0).getAs[Double]("jaccard")
    assert(jac < 0.3, s"jaccard unexpectedly high: $jac")
  }

  test("corpus telemetry: KMV distinct estimate — exact under k, ~right above") {
    val d = "/root/testdata/sf0.01"
    val got = graft.ops.DataQueries.corpusTelemetry(spark, d).collect()
    val exact = Tables.documents(spark, d)
      .groupBy("source")
      .agg(countDistinct(graft.ops.TextOps.h64(col("text"))).as("uniq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val est = r.getAs[Double]("approx_uniq")
      val ex = exact(r.getString(0)).toDouble
      if (ex < 64)
        // below the sketch size the k-min set holds every distinct hash
        assert(est == ex, s"${r.getString(0)}: $est vs exact $ex")
      else
        // KMV relative error ~ 1/sqrt(k−2) ≈ 13% at k=64; allow 3σ
        assert(math.abs(est - ex) / ex <= 0.4, s"${r.getString(0)}: $est vs $ex")
    }
  }

  test("cosine/ANN/IVF/semdedup drop zero-norm and null vectors, no 0-div") {
    val rows = Seq(
      (1L, Some(Array(1.0f, 0.0f)), 0),
      (2L, Some(Array(0.9f, 0.1f)), 0),
      (3L, Some(Array(0.0f, 0.0f)), 0),  // zero norm
      (4L, None, 0))                     // null vector
    val df = rows.toDF("vec_id", "embedding", "label")
    val topk = VectorOps.cosineTopK(df, df, "vec_id", "embedding", 2)
      .select("query_id").as[Long].collect().toSet
    assert(topk == Set(1L, 2L))
    val ann = VectorOps.annTopK(df, "vec_id", "embedding", 2, 1, col("vec_id") < 3)
      .select("cand_id").as[Long].collect().toSet
    assert(!ann.contains(3L) && !ann.contains(4L))
    val ivf = VectorOps.ivfTopK(df, "vec_id", "embedding", 2, 1, 1, col("vec_id") < 3)
      .select("cand_id").as[Long].collect().toSet
    assert(!ivf.contains(3L) && !ivf.contains(4L))
    val sd = VectorOps.semDedup(df, "vec_id", "embedding", 2, 0.99)
      .select("vec").as[Long].collect().toSet
    assert(sd == Set(1L, 2L))
  }
}
