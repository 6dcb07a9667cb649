package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("rowMean / rowMedian skip nulls like pandas axis=1") {
    val df = Seq(
      (Some(1.0), Some(3.0), Some(5.0)),
      (Some(2.0), None, Some(4.0)),
      (None, None, None)
    ).toDF("a", "b", "c")
    val cols = Seq(col("a"), col("b"), col("c"))
    val got = df.select(
      TimeSeries.rowMean(cols).as("m"),
      TimeSeries.rowMedian(cols).as("med")).collect()
    assert(got(0).getDouble(0) == 3.0 && got(0).getDouble(1) == 3.0)
    assert(got(1).getDouble(0) == 3.0 && got(1).getDouble(1) == 3.0)
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
  }

  test("resampleFfill fills gaps per key without leaking across keys") {
    val df = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0, 1L),
      ("a", ts("2024-01-01 03:20:00"), 4.0, 2L),
      ("b", ts("2024-01-01 01:05:00"), 9.0, 3L)
    ).toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleFfill(df, "k", "t", "v", "hour", "id")
      .orderBy("k", "bucket").collect()
    // key a: 00,01,02,03 → 1,1(filled),1(filled),4 ; key b: just 01 → 9
    assert(got.length == 5)
    assert(got.take(4).map(_.getDouble(2)).toSeq == Seq(1.0, 1.0, 1.0, 4.0))
    assert(got(4).getString(0) == "b" && got(4).getDouble(2) == 9.0)
  }

  test("resampleLast keeps the chronologically last row per bucket") {
    val df = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0, 1L),
      ("a", ts("2024-01-01 00:50:00"), 2.0, 2L),
      ("a", ts("2024-01-01 00:50:00"), 3.0, 9L) // same ts → higher id wins
    ).toDF("k", "t", "v", "id")
    val got = TimeSeries.resampleLast(df, "k", "t", "v", "hour", "id").collect()
    assert(got.length == 1 && got(0).getDouble(2) == 3.0)
  }

  test("ewmMean matches pandas adjust=False recursion with min_periods") {
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "t", "v")
    val got = TimeSeries.ewmMean(df, "k", "t", "v", halflife = 3.0,
        minPeriods = 2, out = "b")
      .orderBy("t").select("b").collect()
    // pandas: s.ewm(alpha=1-0.5**(1/3), adjust=False, min_periods=2).mean()
    val exp = Seq(None, Some(2.58740105196820), Some(2.87881947462977),
      Some(2.49122000000000), Some(3.00878000000000), Some(4.24476552669313),
      Some(3.78167158286918), Some(4.23931157094522))
    got.zip(exp).foreach {
      case (r, None) => assert(r.isNullAt(0))
      case (r, Some(e)) => assert(math.abs(r.getDouble(0) - e) < 1e-6)
    }
  }

  test("ewmMean halflife<=0 yields zero bias") {
    val df = Seq(("k", 0L, 5.0), ("k", 1L, 7.0)).toDF("k", "t", "v")
    val got = TimeSeries.ewmMean(df, "k", "t", "v", halflife = 0.0,
      minPeriods = 1, out = "b").select("b").collect()
    assert(got.forall(_.getDouble(0) == 0.0))
  }

  test("rollingStats honors min_periods and ddof") {
    val df = (1 to 5).map(i => ("k", i.toLong, i.toDouble)).toDF("k", "t", "v")
    val got = TimeSeries.rollingStats(df, "k", "t", "v", n = 3, minPeriods = 3,
        ddofZero = true, meanCol = "m", stdCol = "s")
      .orderBy("t").collect()
    assert(got(0).isNullAt(3) && got(1).isNullAt(3))
    assert(got(2).getDouble(3) == 2.0) // mean(1,2,3)
    assert(math.abs(got(2).getDouble(4) - math.sqrt(2.0 / 3.0)) < 1e-12) // pop std
  }

  test("forwardLabel drops dev>=0 and tail rows without lookahead") {
    val df = Seq(
      ("k", 1L, -5.0), ("k", 2L, 1.0), ("k", 3L, -2.0), ("k", 4L, -1.0)
    ).toDF("k", "t", "dev")
    val got = TimeSeries.forwardLabel(df, "k", "t", "dev", horizon = 2, target = 3.0)
      .orderBy("t").collect()
    // t=1: fmax over {1,-2}=1, 1-(-5)=6>=3 → y=1 ; t=2 dev>0 skip;
    // t=3: fmax={-1}, -1-(-2)=1<3 → y=0 ; t=4: no lookahead → dropped
    assert(got.map(r => (r.getLong(1), r.getInt(4))).toSeq == Seq((1L, 1), (3L, 0)))
  }

  test("canonizePair truth table (pyc stable_fee_ml_bot.py:57-63)") {
    val allowed = Seq(("DAI", "USDC"), ("DAI", "USDT"), ("USDC", "USDT"))
    val df = Seq(("DAI", "USDC"), ("USDC", "DAI"), ("USDT", "USDC"))
      .toDF("a", "b")
    val got = df.select(TimeSeries.canonizePair(col("a"), col("b"), allowed).as("c"))
      .select("c.a", "c.b", "c.sign").collect()
    assert(got(0) == Row("DAI", "USDC", 1))
    assert(got(1) == Row("DAI", "USDC", -1))
    assert(got(2) == Row("USDC", "USDT", -1))
  }

  test("ewmMeanPrefix (distributed closed form) equals the exact fold") {
    val xs = (1 to 200).map(i => math.sin(i * 0.7) * 50 + i * 0.1)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "t", "v")
    val fold = TimeSeries.ewmMean(df, "k", "t", "v", 12.0, 5, "b")
      .orderBy("t").collect()
    val pref = TimeSeries.ewmMeanPrefix(df, "k", "t", "v", 12.0, 5, "b")
      .orderBy("t").collect()
    fold.zip(pref).foreach { case (f, p) =>
      if (f.isNullAt(3)) assert(p.isNullAt(3))
      else assert(math.abs(f.getDouble(3) - p.getDouble(3)) < 1e-9)
    }
  }

  test("polarity flips sign only when median >= 0") {
    val df = Seq(("p", 1.0), ("p", 2.0), ("n", -1.0), ("n", -2.0)).toDF("k", "v")
    val got = TimeSeries.polarity(df, "k", "v").orderBy("k", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("n", -2.0), ("n", -1.0), ("p", -2.0), ("p", -1.0)))
  }
}
