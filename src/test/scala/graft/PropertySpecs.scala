package graft

import graft.ops.{Backtest, TimeSeries}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5). Each property runs a real
  * Spark job on the shared local session, so counts are kept small. */
abstract class SparkProps(name: String) extends Properties(name) {
  lazy val spark = SparkSpec.session
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)
}

/** The cross-engine determinism proof for [[graft.ops.SamplingOps
  * .weightedKey]]: ln is only ever evaluated on the finite 1e6-point
  * u-grid and rounded to micro-units, so exhaustively checking every
  * grid point's distance to a .5 rounding boundary bounds the worst
  * case FOREVER — no randomized (key, weight) space can find an input
  * the sweep didn't cover, because the weight enters through exact
  * integer division only. Pure driver-side math, no Spark job. */
object SamplingProps extends Properties("Sampling") {
  property("log-grid micro-rounding sits ≥1e-6 from every .5 boundary") = {
    var minDist = Double.MaxValue
    var m = 1
    while (m <= 1000000) {
      val x = -math.log(m / 1e6) * 1e6
      val d = math.abs(x - math.floor(x) - 0.5)
      if (d < minDist) minDist = d
      m += 1
    }
    // worst cross-engine 1-ulp disagreement at |x| ≤ 1.4e7 is ~1.2e-8;
    // the measured grid margin is 1.317e-6 — two orders of headroom
    Prop(minDist > 1e-6) :| s"min boundary distance $minDist"
  }

  property("tempMix pow grid sits ≥7e-7 from every .5 micro boundary") = {
    // same exhaustive-grid proof for DataQueries.tempMix: pow(·, 0.3)
    // is only evaluated on {k/1e6}, so sweeping k bounds the worst case
    var minDist = Double.MaxValue
    var k = 0
    while (k <= 1000000) {
      val x = math.pow(k / 1e6, 0.3) * 1e6
      val d = math.abs(x - math.floor(x) - 0.5)
      if (d < minDist) minDist = d
      k += 1
    }
    Prop(minDist > 7e-7) :| s"min boundary distance $minDist"
  }

  property("integer key equals exact BigDecimal reference for random weights") =
    forAll(Gen.chooseNum(1, 1000000), Gen.chooseNum(1L, 1000000L)) { (m, w) =>
      val lfx = math.round(-math.log(m / 1e6) * 1e6)
      val key = lfx * 1000000000L / w
      // reference: exact integer floor-division in BigInt space
      val ref = (BigInt(lfx) * BigInt(1000000000L) / BigInt(w)).toLong
      Prop(key == ref) :| s"m=$m w=$w key=$key ref=$ref"
    }
}

object FsmProps extends SparkProps("FSM") {
  import org.apache.spark.sql.functions._

  private val devSeq: Gen[List[Double]] =
    Gen.listOfN(40, Gen.chooseNum(-1.0, 1.0))

  property("trades alternate and respect entry/exit thresholds") =
    forAll(devSeq) { devs =>
      val sp = spark
      import sp.implicits._
      val df = devs.zipWithIndex
        .map { case (d, i) => ("p", i.toLong, 10.0 + i, d) }
        .toDF("k", "t", "px", "dev")
      val trades = Backtest.meanReversion(df, "k", "t", "px", "dev", thr = 0.5)
        .orderBy("entry_ts").collect()
      val nonOverlapping = trades.sliding(2).forall {
        case Array(a, b) => a.getLong(3) < b.getLong(2) // exit_a < entry_b
        case _ => true
      }
      val entryOk = trades.forall { tr =>
        val d = devs(tr.getLong(2).toInt)
        if (tr.getString(1) == "long") d <= -0.5 else d >= 0.5
      }
      val exitOk = trades.forall { tr =>
        val d = devs(tr.getLong(3).toInt)
        if (tr.getString(1) == "long") d >= 0 else d <= 0
      }
      Prop(nonOverlapping && entryOk && exitOk)
    }

  property("zscore time stop bounds held_rows when z is dense") =
    forAll(Gen.listOfN(40, Gen.chooseNum(-3.0, 3.0))) { zs =>
      val sp = spark
      import sp.implicits._
      val df = zs.zipWithIndex
        .map { case (z, i) => ("p", i.toLong, 10.0 + i, z) }
        .toDF("k", "t", "px", "z")
      val trades = Backtest.zscoreReversion(df, "k", "t", "px", "z",
        entryZ = 2.0, exitZ = 0.2, maxHold = 5).collect()
      Prop(trades.forall(_.getInt(9) <= 5))
    }
}

object SeriesProps extends SparkProps("TimeSeries") {
  import org.apache.spark.sql.functions._

  private val series: Gen[List[(Int, Double)]] = for {
    n <- Gen.chooseNum(1, 15)
    hours <- Gen.pick(n, 0 until 48)
    vals <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
  } yield hours.toList.zip(vals)

  property("resampleFfill yields a dense grid with no nulls after the first bucket") =
    forAll(series) { pts =>
      val sp = spark
      import sp.implicits._
      val df = pts.zipWithIndex.map { case ((h, v), i) =>
        ("k", java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"), v, i.toLong)
      }.toDF("k", "t", "v", "id")
      val out = TimeSeries.resampleFfill(df, "k", "t", "v", "hour", "id")
        .orderBy("bucket").collect()
      val hours = pts.map(_._1)
      val expectedLen = hours.max - hours.min + 1
      Prop(out.length == expectedLen && out.forall(!_.isNullAt(2)))
    }

  property("resample of an already-regular grid is the identity") =
    forAll(Gen.listOfN(10, Gen.chooseNum(-50.0, 50.0))) { vals =>
      val sp = spark
      import sp.implicits._
      val df = vals.zipWithIndex.map { case (v, i) =>
        ("k", java.sql.Timestamp.valueOf(f"2024-01-01 $i%02d:00:00"), v, i.toLong)
      }.toDF("k", "t", "v", "id")
      val out = TimeSeries.resampleFfill(df, "k", "t", "v", "hour", "id")
        .orderBy("bucket").collect().map(_.getDouble(2))
      Prop(out.toSeq == vals)
    }

  property("ewm bias stays within the running min/max envelope") =
    forAll(Gen.listOfN(12, Gen.chooseNum(-10.0, 10.0))) { vals =>
      val sp = spark
      import sp.implicits._
      val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("k", "t", "v")
      val out = TimeSeries.ewmMean(df, "k", "t", "v", halflife = 4.0,
          minPeriods = 1, out = "b")
        .orderBy("t").collect().map(_.getDouble(3))
      val ok = out.zipWithIndex.forall { case (b, i) =>
        val seen = vals.take(i + 1)
        b >= seen.min - 1e-9 && b <= seen.max + 1e-9
      }
      Prop(ok)
    }
}

object AsofProps extends SparkProps("AsofJoin") {
  import org.scalacheck.Prop

  private val leftG = Gen.listOfN(15,
    Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(0L, 30L)))
  private val rightG = Gen.listOfN(12,
    Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(0L, 30L), Gen.chooseNum(-9.0, 9.0)))

  property("equals the naive latest-prior lookup on random series") =
    forAll(leftG, rightG) { (ls, rs0) =>
      val sp = spark
      import sp.implicits._
      // right rows unique per (key, ts) — the operator's contract
      val rs = rs0.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = rs.toDF("k", "t", "v")
      val got = TimeSeries.asofJoin(left, right, "k", "t", "t", Seq("v"))
        .select("id", "r_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> rs.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      Prop(got == want)
    }
}

object CcProps extends SparkProps("ConnectedComponents") {
  import org.scalacheck.Prop
  import graft.ops.DedupOps

  private val edgesG = Gen.listOfN(14,
    Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L)))
    .map(_.filter { case (a, b) => a != b })
    .suchThat(_.nonEmpty)

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  property("equals union-find on random graphs") =
    forAll(edgesG) { edges =>
      val sp = spark
      import sp.implicits._
      // limit 0 forces the distributed propagation loop (the driver
      // fast path IS union-find — testing it against itself proves
      // nothing)
      val got = DedupOps.connectedComponents(edges.toDF("a", "b"),
          localEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      // canonicalize union-find roots to the component MIN, like CC does
      val uf = unionFind(edges)
      val minOfComp = uf.groupBy(_._2).map { case (root, m) =>
        root -> m.keys.min
      }
      val want = uf.map { case (n, root) => n -> minOfComp(root) }
      Prop(got == want)
    }

  property("contraction CC equals union-find on random graphs") =
    forAll(edgesG) { edges =>
      val sp = spark
      import sp.implicits._
      val got = DedupOps.connectedComponentsContract(edges.toDF("a", "b"),
          localEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      val uf = unionFind(edges)
      val minOfComp = uf.groupBy(_._2).map { case (root, m) =>
        root -> m.keys.min
      }
      val want = uf.map { case (n, root) => n -> minOfComp(root) }
      Prop(got == want)
    }
}

object SessionProps extends SparkProps("SessionInterval") {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.functions._

  private def tsOf(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(java.time.LocalDateTime
      .ofEpochSecond(1700000000L + sec, 0, java.time.ZoneOffset.UTC))

  // (key, offset-seconds, value) rows; duplicate offsets allowed
  private val rowsG: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(40, for {
      k <- Gen.oneOf(1L, 2L)
      s <- Gen.chooseNum(0L, 4000L)
      v <- Gen.chooseNum(-5.0, 5.0)
    } yield (k, s, v))

  property("bucketed interval join equals the naive range scan") =
    forAll(rowsG) { rows =>
      val sp = spark
      import sp.implicits._
      val data = rows.zipWithIndex.map { case ((k, s, v), i) =>
        (i.toLong, k, tsOf(s), v, s)
      }
      val df = data.toDF("id", "k", "t", "v", "sec")
      val probe = df.filter(col("id") % 2 === 0).select("id", "k", "t")
      val lookback = 600L
      val got = TimeSeries.intervalJoinAgg(probe, df, "k", "t", "t", "v", lookback)
        .collect().map(r => (r.getLong(0), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]).getOrElse(Double.NaN)))
        .toList.sortBy(_._1)
      val want = data.filter(_._1 % 2 == 0).map { case (id, k, _, _, ps) =>
        val hits = data.filter { case (_, bk, _, _, bs) =>
          bk == k && bs >= ps - lookback && bs < ps
        }
        val sum = if (hits.isEmpty) Double.NaN else hits.map(_._4).sum
        (id, hits.size.toLong, sum)
      }.sortBy(_._1)
      val eq = got.size == want.size && got.zip(want).forall { case (g, w) =>
        g._1 == w._1 && g._2 == w._2 &&
          ((g._3.isNaN && w._3.isNaN) || math.abs(g._3 - w._3) < 1e-9)
      }
      Prop(eq) :| s"got=$got want=$want"
    }

  property("sessionize splits exactly at gaps > g, per key") =
    forAll(rowsG) { rows =>
      val sp = spark
      import sp.implicits._
      val data = rows.zipWithIndex.map { case ((k, s, _), i) =>
        (i.toLong, k, tsOf(s), s)
      }
      val df = data.toDF("id", "k", "t", "sec")
      val gap = 300L
      val got = TimeSeries.sessionize(df, "k", "t", gap, "id")
        .select("id", "session_no").as[(Long, Long)].collect().toMap
      // naive: per key, sort by (sec, id), split when gap exceeded
      val want = data.groupBy(_._2).flatMap { case (_, g) =>
        val sorted = g.sortBy(r => (r._4, r._1))
        var sess = 0L
        var prev = Long.MinValue
        sorted.map { r =>
          if (prev == Long.MinValue || r._4 - prev > gap) sess += 1
          prev = r._4
          r._1 -> sess
        }
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }
}

/** The KMV telemetry sketch's distributed-merge contract (pure math, no
  * Spark): the k-min register of a union equals the k-min of the merged
  * per-part registers, so per-partition (or per-corpus) sketches
  * combine losslessly into the global estimate — the property that lets
  * `corpusTelemetry` run without ever shuffling all distinct hashes. */
object KmvProps extends Properties("KMV") {
  private val K = 64
  private val HSpace = 1152921504606846976.0 // 2^60
  private def kmin(xs: Set[Long]): Vector[Long] = xs.toVector.sorted.take(K)
  // the estimator exactly as corpusTelemetry / the q_corpus_stats oracle
  // spell it: exact below k, (k−1)·2^60/h_(k) at or above
  private def est(s: Set[Long]): Double = {
    val km = kmin(s)
    if (km.size < K) km.size.toDouble else (K - 1).toDouble * (HSpace / km.last)
  }
  // sizes straddle K so both estimator branches actually run
  private val hashes = Gen.chooseNum(0, 3 * K)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 1L << 60)))

  property("k-min registers merge losslessly across parts") =
    forAll(hashes, hashes) { (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      kmin((kmin(sa) ++ kmin(sb)).toSet) == kmin(sa ++ sb)
    }

  property("merged-register estimate equals the whole-set estimate") =
    forAll(hashes, hashes) { (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      est((kmin(sa) ++ kmin(sb)).toSet) == est(sa ++ sb)
    }

  property("estimate exact below k; formula branch positive at/above k") =
    forAll(hashes) { a =>
      val s = a.toSet
      if (s.size < K) est(s) == s.size.toDouble
      else est(s) > 0.0 && est(s) == (K - 1).toDouble * (HSpace / kmin(s).last)
    }
}

/** Random-token invariants for the one-pass shingle/CDC expressions —
  * each case evaluates the real Catalyst expression through a 1-row
  * Spark job and checks it against independently-computed references. */
object ShingleExprProps extends SparkProps("ShingleExprs") {
  import org.apache.spark.sql.functions._
  import graft.ops.{Hashing, TextOps}

  private val word: Gen[String] =
    Gen.choose(0, 29).map(i => s"w$i")
  private val toks: Gen[List[String]] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, word))

  private def evalExpr(fn: String, tokens: List[String], arg: Int): Seq[Long] = {
    val sp = spark
    import sp.implicits._
    Seq(Tuple1(tokens)).toDF("tk")
      .select(call_function(fn, col("tk"), lit(arg)).as("out"))
      .collect().head.getSeq[Long](0)
  }

  property("shingle_h64s_all = h64 of every positional 3-gram, in order") =
    forAll(toks) { tk =>
      val want = tk.sliding(3).filter(_.size == 3)
        .map(g => Hashing.h64(g.mkString(" "))).toSeq
      evalExpr("shingle_h64s_all", tk, 3) == want
    }

  property("shingle_pairs zips each gram with its own h64") =
    forAll(toks) { tk =>
      val sp = spark
      import sp.implicits._
      val rows = Seq(Tuple1(tk)).toDF("tk")
        .select(explode_outer(call_function("shingle_pairs", col("tk"), lit(3))).as("p"))
        .filter(col("p").isNotNull)
        .select(col("p.h"), col("p.s"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val want = tk.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      rows.map(_._2) == want && rows.forall { case (h, s) => h == Hashing.h64(s) }
    }

  property("drop_repeated_windows equals the driver one-pass replay") =
    forAll(toks) { tk =>
      // driver twin of the expression's single pass (n = 3: the tiny
      // vocab makes repeats frequent)
      val n = 3
      val covered = Array.fill(tk.length)(false)
      if (tk.length >= n) {
        val seen = scala.collection.mutable.Set.empty[Long]
        for (i <- 0 to tk.length - n)
          if (!seen.add(Hashing.h64(tk.slice(i, i + n).mkString(" "))))
            (i until i + n).foreach(covered(_) = true)
      }
      val want = tk.indices.filterNot(covered).map(tk)
      val sp = spark
      import sp.implicits._
      val got = Seq(Tuple1(tk)).toDF("tk")
        .select(call_function("drop_repeated_windows", col("tk"), lit(n)))
        .collect().head.getSeq[String](0)
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("cdc chunk count = boundary tokens + trailing partial") =
    forAll(toks) { tk =>
      val bounds = tk.count(t => Hashing.h64(t) % 8 == 0)
      val trailing =
        if (tk.isEmpty) 0
        else if (Hashing.h64(tk.last) % 8 == 0) 0 else 1
      evalExpr("cdc_chunk_h64s", tk, 8).size == bounds + trailing
    }

  property("cdc re-sync: a non-boundary head insertion changes ONLY chunk 1") =
    forAll(toks) { tk0 =>
      // make the inserted token non-boundary, and ensure ≥1 boundary
      // exists so there IS a tail to re-sync
      val ins = (0 to 40).map(i => s"x$i")
        .find(t => Hashing.h64(t) % 8 != 0).get
      val a = evalExpr("cdc_chunk_h64s", tk0, 8)
      val b = evalExpr("cdc_chunk_h64s", ins :: tk0, 8)
      // every chunk after the first is identical — boundaries re-sync
      a.isEmpty || (b.size == a.size && b.drop(1) == a.drop(1).toSeq)
    }
}

/** Prefix-filtering losslessness on RANDOM heavy-collision corpora:
  * prefixJoin's pair set must equal the direct τ=1/2 threshold join
  * recomputed driver-side from the exact shingle sets — the law
  * q_prefix_join pins on the fixture corpus, checked here on
  * arbitrary inputs (tiny vocab → adversarial overlap). */
object PrefixJoinProps extends SparkProps("PrefixJoin") {
  import graft.ops.{DedupOps, Hashing}

  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(10, Gen.chooseNum(3, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((0 until 8).map(i => s"w$i")))
        .map(_.mkString(" "))))

  property("prefix candidates lose no τ≥1/2 pair") =
    forAll(corpusGen) { texts =>
      val sp = spark
      import sp.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = DedupOps.prefixJoin(docs, "doc_id", "text", 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split("\\s+").filter(_.nonEmpty)
          .sliding(3).filter(_.length == 3)
          .map(g => Hashing.h64(g.mkString(" "))).toSet
      }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size
        uni = sets(a).size + sets(b).size - inter
        if inter * 2 >= uni
      } yield (a, b)).toSet
      Prop(got == want) :| s"got=${got.size} want=${want.size}"
    }
}

/** Sketch laws on random corpora: a Bloom screen may overestimate
  * membership but never underestimate, and a CMS counter is an upper
  * bound on every true count — the two inequalities the calibration
  * queries (q_bloom_screen / q_cms_err) rely on, checked here on
  * adversarially random inputs rather than the fixture corpus. */
/** The relational BPE trainer equals the classic SEQUENTIAL trainer
  * (textbook Sennrich-2016 semantics: count EVERY adjacent pair,
  * overlapping self-pair occurrences included; apply the winner
  * greedily left-to-right non-overlapping) on random corpora — the law
  * that justifies expressing the merge as a join. For x≠y winners
  * occurrences can't overlap; for x=y winners left-to-right
  * application is run-length parity, which the operator computes via
  * gaps-and-islands run ids. The generator's alphabet is duplicate-
  * heavy so "aa"-style runs (odd AND even lengths) are frequent. */
object BpeProps extends SparkProps("BPE") {
  import org.apache.spark.sql.functions._

  private val wordGen = Gen.chooseNum(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'a', 'a', 'b', 'c'))
      .map(_.mkString))
  private val corpusGen = Gen.chooseNum(5, 20)
    .flatMap(n => Gen.listOfN(n, wordGen))

  /** Sequential reference: word-frequency table, argmax pair by
    * (count desc, x, y) over ALL adjacent pairs (self-pairs counted at
    * every occurrence, overlaps included — Sennrich get_stats), greedy
    * left-to-right non-overlapping merge. A round with no candidate
    * pair emits nothing and ends training (mirroring the operator's
    * empty-top degenerate behavior). */
  private def refBpe(words: Seq[String], rounds: Int)
      : Seq[(Long, String, String, Long, Long, Long)] = {
    var tab: Seq[(List[String], Long)] = words.groupBy(identity).toSeq
      .map { case (w, g) => (w.split("").filter(_.nonEmpty).toList, g.size.toLong) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Long, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val before = tab.map { case (ss, c) => ss.length * c }.sum
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      tab.foreach { case (ss, c) =>
        ss.zip(ss.tail)
          .foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      if (pairs.isEmpty) done = true
      else {
        val (x, y) = pairs.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        val cnt = pairs((x, y))
        tab = tab.map { case (ss, c) =>
          val nw = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == x && ss(i + 1) == y) {
              nw += x + y; i += 2
            } else { nw += ss(i); i += 1 }
          }
          (nw.toList, c)
        }
        val after = tab.map { case (ss, c) => ss.length * c }.sum
        out += ((r.toLong, x, y, cnt, before, after))
        r += 1
      }
    }
    out.toSeq
  }

  property("relational merges equal the sequential trainer for 2 rounds") =
    forAll(corpusGen) { words =>
      val sp = spark
      import sp.implicits._
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ops.DataQueries.bpeMergesOf(docs, 2).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2),
          x.getLong(3), x.getLong(4), x.getLong(5))).toSeq
      val want = refBpe(words, 2)
      Prop(got == want) :| s"words=$words got=$got want=$want"
    }

  // wider alphabet so disjoint winners actually exist and batching
  // ENGAGES (the a/b/c gen above mostly exercises the fallbacks)
  private val wideWordGen = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n,
      Gen.oneOf('a' to 'j')).map(_.mkString))
  private val wideCorpusGen = Gen.chooseNum(8, 40)
    .flatMap(n => Gen.listOfN(n, wideWordGen))

  /** The batched trainer's contract is UNCONDITIONAL equality with the
    * sequential trainer — batching engages only when the safe-prefix
    * rule proves the batch is what the sequential trainer would do,
    * and falls back to single merges otherwise. Pinned on both the
    * duplicate-heavy gen (self-pairs, concat collisions → fallbacks)
    * and the wide gen (real batches). */
  property("batched trainer ≡ sequential trainer (duplicate-heavy corpora)") =
    forAll(corpusGen, Gen.chooseNum(1, 4)) { (words, mb) =>
      val sp = spark
      import sp.implicits._
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ops.DataQueries
        .bpeTrainBatchedOf(docs, merges = 6, maxBatch = mb).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
        .toSeq
      val want = refBpe(words, 6).map(t => (t._1, t._2, t._3, t._4))
      Prop(got == want) :| s"mb=$mb words=$words got=$got want=$want"
    }

  property("batched trainer ≡ sequential trainer (wide-alphabet corpora)") =
    forAll(wideCorpusGen, Gen.chooseNum(2, 6)) { (words, mb) =>
      val sp = spark
      import sp.implicits._
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ops.DataQueries
        .bpeTrainBatchedOf(docs, merges = 8, maxBatch = mb).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
        .toSeq
      val want = refBpe(words, 8).map(t => (t._1, t._2, t._3, t._4))
      Prop(got == want) :| s"mb=$mb words=$words got=$got want=$want"
    }

  /** Textbook reference apply: the trainer's own merge scan (match at
    * i → consume i, i+1 → continue at i+2) replayed per rule. */
  private def refApply(w: String, merges: Seq[(String, String)]): List[String] = {
    var ss: List[String] = w.split("").filter(_.nonEmpty).toList
    merges.foreach { case (x, y) =>
      val nw = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < ss.length) {
        if (i + 1 < ss.length && ss(i) == x && ss(i + 1) == y) {
          nw += x + y; i += 2
        } else { nw += ss(i); i += 1 }
      }
      ss = nw.toList
    }
    ss
  }

  /** The apply-side law behind q_bpe_apply64: replaying the learned
    * merges rank-by-rank through bpeFoldOne (the left-to-right fold)
    * reproduces the textbook per-rule merge scan on every word —
    * self-pair run parity and cross-rank rule interaction included
    * (both generators: duplicate-heavy forces "aa"-runs, wide-alphabet
    * forces multi-level merges). */
  property("bpeFoldOne rank-ordered replay ≡ textbook per-rule apply") =
    forAll(Gen.oneOf(corpusGen, wideCorpusGen)) { words =>
      val merges = refBpe(words, 8).map(t => (t._2, t._3))
      val bad = words.distinct.flatMap { w =>
        var syms = w.split("").filter(_.nonEmpty)
        merges.foreach { case (x, y) =>
          syms = graft.ops.DataQueries.bpeFoldOne(syms, x, y)
        }
        val want = refApply(w, merges)
        if (syms.toList == want) None else Some((w, syms.toList, want))
      }
      Prop(bad.isEmpty) :| s"words=$words diverged=$bad merges=$merges"
    }
}

/** Fixed-round k-core peeling reaches the true k-core fixpoint once
  * rounds ≥ the peeling depth — on small random graphs, |V| rounds
  * always suffice and match a driver-side peel-to-fixpoint. */
object KcoreProps extends SparkProps("Kcore") {
  import org.apache.spark.sql.functions._

  private val graphGen = for {
    n <- Gen.chooseNum(3, 8)
    m <- Gen.chooseNum(1, 14)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(1, n); b <- Gen.chooseNum(1, n) if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield es.distinct

  private def refCore(und: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var alive = und.flatMap(e => Seq(e._1, e._2)).toSet
    var deg = Map.empty[Long, Long]
    var changed = true
    while (changed) {
      deg = alive.map(v => v -> und.count { case (a, b) =>
        (a == v && alive(b)) || (b == v && alive(a)) }.toLong).toMap
      val next = alive.filter(v => deg(v) >= k)
      changed = next != alive
      alive = next
    }
    alive.map(v => v -> deg(v)).toMap
  }

  property("rounds=|V| peeling equals the driver fixpoint for k=2") =
    forAll(graphGen) { und0 =>
      // graphGen can yield an empty list after the a!=b filter; peel a
      // guaranteed edge in instead of discarding (keeps test count)
      val und = if (und0.nonEmpty) und0 else Seq((1L, 2L))
      val sp = spark
      import sp.implicits._
      val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
      val n = und.flatMap(e => Seq(e._1, e._2)).distinct.size
      val got = graft.ops.GraphOps.kCoreFixed(edges, 2, n.max(1)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refCore(und, 2)
      Prop(got == want) :| s"edges=$und got=$got want=$want"
    }
}

/** Relational synchronous label propagation equals a driver-side
  * reference on random graphs: plurality neighbor label, smallest
  * label on ties, fixed synchronous rounds. */
object LabelPropProps extends SparkProps("LabelProp") {
  import org.apache.spark.sql.functions._

  private val graphGen = for {
    n <- Gen.chooseNum(3, 8)
    m <- Gen.chooseNum(1, 14)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(1, n); b <- Gen.chooseNum(1, n) if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield es.distinct

  private def refLpa(nodes: Seq[Long], und: Seq[(Long, Long)],
                     rounds: Int): Map[Long, Long] = {
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    var lbl: Map[Long, Long] =
      adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (v, ns) =>
        val counts = ns.groupBy(lbl).map { case (l, g) => (l, g.size) }
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    nodes.map(v => v -> lbl.getOrElse(v, v)).toMap
  }

  property("3 sync rounds equal the driver reference") =
    forAll(graphGen) { und0 =>
      val und = if (und0.nonEmpty) und0 else Seq((1L, 2L))
      val sp = spark
      import sp.implicits._
      val nodes = (1L to und.flatMap(e => Seq(e._1, e._2)).max).toSeq
      val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
      val got = graft.ops.GraphOps
        .labelPropOf(nodes.toDF("id"), edges, 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = refLpa(nodes, und, 3)
      Prop(got == want) :| s"edges=$und got=$got want=$want"
    }
}

/** The incremental-CC law on random corpora and ARBITRARY batch
  * splits: folding the batch into the base components equals
  * re-clustering the whole corpus, for any partition of the docs. */
object IncrCcProps extends SparkProps("IncrCC") {
  import org.apache.spark.sql.functions._
  import graft.ops.{DataQueries, DedupOps}

  // duplicate-heavy tiny corpus (10-token vocab) so near-dup pairs and
  // multi-doc components actually form, plus a random batch mask
  private val caseGen = for {
    n <- Gen.chooseNum(6, 14)
    texts <- Gen.listOfN(n, Gen.chooseNum(5, 10).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf((0 until 10).map(i => s"w$i")))
        .map(_.mkString(" "))))
    mask <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield (texts, mask)

  property("incremental fold equals full recompute for any split") =
    forAll(caseGen) { case (texts, mask) =>
      val sp = spark
      import sp.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val batchIds = mask.zipWithIndex.collect { case (true, i) => i.toLong }
      val got = DataQueries
        .incrCcOf(docs, id => id.isInCollection(
          if (batchIds.isEmpty) Seq(-1L) else batchIds))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sorted
      val full = DedupOps.connectedComponents(
        DedupOps.jaccardPairs(docs, "doc_id", "text", n = 3,
          threshold = 0.1, maxDocFreq = None)
          .select("doc_a", "doc_b"))
      val szs = full.groupBy("comp").agg(count(lit(1)).as("cs"))
      val want = full.join(szs, Seq("comp"))
        .select(col("node"), col("comp"), col("cs"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sorted
      Prop(got == want) :| s"texts=$texts mask=$mask got=$got want=$want"
    }

  property("CAPPED incremental fold equals the capped full recompute for any split") =
    forAll(caseGen) { case (texts, mask) =>
      // cap 3 on the 10-token vocab binds constantly — exactly the
      // regime where a leg reading a different keep-set would diverge
      val cap = 3L
      val sp = spark
      import sp.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val batchIds = mask.zipWithIndex.collect { case (true, i) => i.toLong }
      val got = DataQueries
        .incrCcOf(docs, id => id.isInCollection(
          if (batchIds.isEmpty) Seq(-1L) else batchIds),
          maxDocFreq = Some(cap))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sorted
      val full = DedupOps.connectedComponents(
        DedupOps.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.1,
          maxDocFreq = Some(cap)).select("doc_a", "doc_b"))
      val szs = full.groupBy("comp").agg(count(lit(1)).as("cs"))
      val want = full.join(szs, Seq("comp"))
        .select(col("node"), col("comp"), col("cs"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sorted
      Prop(got == want) :| s"texts=$texts mask=$mask got=$got want=$want"
    }
}

/** The cap-crossing law for the CAPPED streaming CC maintainer: for
  * ANY corpus, ANY batch split, ANY interleaving of mid-stream recaps,
  * folding with the live keep-set and then running the cap-crossing
  * compaction ([[graft.streaming.StreamOps.recapCc]]) equals the
  * capped BATCH recompute — i.e. the recap retires exactly the stale
  * edges of shingles that crossed the cap mid-stream. */
object CcRecapProps extends SparkProps("CcRecap") {
  import org.apache.spark.sql.functions._
  import graft.ops.DedupOps
  import graft.streaming.StreamOps

  private val cap = 3L
  // tiny vocab + low cap so shingles genuinely cross mid-stream
  private val caseGen = for {
    n <- Gen.chooseNum(6, 14)
    texts <- Gen.listOfN(n, Gen.chooseNum(5, 10).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf((0 until 8).map(i => s"w$i")))
        .map(_.mkString(" "))))
    nb <- Gen.chooseNum(2, 4)
    assign <- Gen.listOfN(n, Gen.chooseNum(0, 3))
    recapAfter <- Gen.listOfN(4, Gen.oneOf(true, false))
  } yield (texts, assign.map(_ % nb), nb, recapAfter)

  property("fold + cap-crossing recap equals the capped batch recompute") =
    forAll(caseGen) { case (texts, assign, nb, recapAfter) =>
      val sp = spark
      import sp.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val stateDir = java.nio.file.Files.createTempDirectory("graft_recap")
      val statePath = stateDir.toString
      try {
        (0 until nb).foreach { b =>
          val rows = docs.zip(assign).collect { case (d, a) if a == b => d }
          StreamOps.applyCcBatch(rows.toDF("doc_id", "text"), statePath,
            b.toLong, maxDocFreq = Some(cap))
          if (recapAfter(b)) StreamOps.recapCc(sp, statePath, cap)
        }
        StreamOps.recapCc(sp, statePath, cap)
        val got = StreamOps.readCcState(sp, statePath)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        val want = DedupOps.connectedComponents(
          DedupOps.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id",
            "text", n = 3, threshold = 0.1, maxDocFreq = Some(cap))
            .select("doc_a", "doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        Prop(got == want) :|
          s"texts=$texts assign=$assign recaps=$recapAfter got=$got want=$want"
      } finally {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
          f.delete()
        }
        rm(stateDir.toFile)
      }
    }
}

object SketchProps extends SparkProps("Sketches") {
  import org.apache.spark.sql.functions._
  import graft.ops.{DedupOps, Hashing}

  // random tiny corpus: each doc is 5-12 tokens from a 10-token vocab
  // (heavy collisions on purpose)
  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.chooseNum(5, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((0 until 10).map(i => s"w$i")))
        .map(_.mkString(" "))))

  property("bloom screen never under-reports the exact hits") =
    forAll(corpusGen) { texts =>
      val sp = spark
      import sp.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = DedupOps.bloomScreen(
          docs.filter($"doc_id" % 3 =!= 0), docs.filter($"doc_id" % 3 === 0),
          "doc_id", "text", n = 3)
        .collect()
      Prop(out.forall { r =>
        val (bloom, exact) = (r.getLong(2), r.getLong(3))
        bloom >= exact && bloom <= r.getInt(1)
      })
    }

  property("cms estimate upper-bounds the exact count for every gram") =
    forAll(corpusGen) { texts =>
      val sp = spark
      import sp.implicits._
      // exact counts, driver side
      val exact = scala.collection.mutable.Map.empty[String, Long]
      texts.foreach(_.split(" ").sliding(3).filter(_.length == 3)
        .foreach { w => val g = w.mkString(" "); exact(g) = exact.getOrElse(g, 0L) + 1 })
      // CMS replayed driver side with the same disjoint-field buckets
      val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
      exact.foreach { case (g, c) =>
        val h = Hashing.h64(g)
        (0 until 4).foreach { r =>
          val b = (h >> (r * 15)) & 32767L
          counters((r, b)) = counters.getOrElse((r, b), 0L) + c
        }
      }
      Prop(exact.forall { case (g, c) =>
        val h = Hashing.h64(g)
        val est = (0 until 4).map(r => counters((r, (h >> (r * 15)) & 32767L))).min
        est >= c
      })
    }
}

/** The skew-safe RankKernel equals the naive per-stratum window on
  * RANDOM frames — strata of wildly different sizes, scores quantized
  * coarsely (forcing both bucket collisions and exact ties), zero and
  * repeated masses. RankKernelSpec pins a fixed adversarial fixture
  * and the plan/task-spread properties; this randomizes the data. */
object RankKernelProps extends SparkProps("RankKernel") {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  private val rowGen = for {
    lang <- Gen.oneOf("en", "en", "en", "fr", "zz") // skewed strata
    q <- Gen.chooseNum(0, 20).map(_ / 20.0)         // coarse → many ties
    m <- Gen.chooseNum(0L, 5L)
  } yield (lang, q, m)
  private val frameGen = Gen.chooseNum(1, 60)
    .flatMap(n => Gen.listOfN(n, rowGen))

  property("rank + running mass ≡ the naive window on random skewed frames") =
    forAll(frameGen) { rows =>
      val sp = spark
      import sp.implicits._
      val df = rows.zipWithIndex
        .map { case ((l, q, m), i) => (i.toLong, l, q, m) }
        .toDF("doc_id", "lang", "q", "n_tok")
      val w = Window.partitionBy("lang").orderBy(col("q").desc, col("doc_id"))
      val naive = df
        .withColumn("nr", row_number().over(w).cast("long"))
        .withColumn("nc", sum("n_tok").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("n_tok"))
        .select("doc_id", "nr", "nc")
      val kern = graft.ops.RankKernel.withStratumRank(
          df, "lang", "q", "doc_id", mass = Some("n_tok"), buckets = 8)
        .select(col("doc_id"), col("__rank").as("kr"),
          col("__cum_before").as("kc"))
      val bad = naive.join(kern, Seq("doc_id"))
        .filter(col("nr") =!= col("kr") || col("nc") =!= col("kc"))
        .collect()
      Prop(bad.isEmpty) :| s"rows=$rows diverged=${bad.take(3).toSeq}"
    }
}
