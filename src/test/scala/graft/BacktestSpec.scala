package graft

import graft.ops.Backtest

class BacktestSpec extends SparkSpec {
  import spark.implicits._

  test("meanReversion: entry row makes no exit decision; open tail discarded") {
    // dev: -0.6 (enter long), -0.1 (hold), 0.2 (exit), 0.7 (enter short), stays
    val rows = Seq(
      ("p", 1L, 10.0, -0.6), ("p", 2L, 11.0, -0.1),
      ("p", 3L, 12.0, 0.2), ("p", 4L, 13.0, 0.7), ("p", 5L, 14.0, 0.8))
    val got = Backtest.meanReversion(rows.toDF("k", "t", "px", "dev"),
      "k", "t", "px", "dev", thr = 0.5).collect()
    assert(got.length == 1)
    val t = got(0)
    assert(t.getString(1) == "long")
    assert(t.getDouble(4) == 10.0 && t.getDouble(5) == 12.0)
    assert(math.abs(t.getDouble(6) - 0.2) < 1e-12)
  }

  test("meanReversion: short return is negated") {
    val rows = Seq(("p", 1L, 100.0, 0.9), ("p", 2L, 80.0, -0.1))
    val got = Backtest.meanReversion(rows.toDF("k", "t", "px", "dev"),
      "k", "t", "px", "dev", thr = 0.5).collect()
    assert(got.length == 1 && got(0).getString(1) == "short")
    assert(math.abs(got(0).getDouble(6) - 0.2) < 1e-12) // (100-80)/100
  }

  test("meanReversion: keys are independent") {
    val rows = Seq(
      ("a", 1L, 10.0, -0.6), ("a", 2L, 12.0, 0.1),
      ("b", 1L, 10.0, -0.6), ("b", 2L, 11.0, -0.2))
    val got = Backtest.meanReversion(rows.toDF("k", "t", "px", "dev"),
      "k", "t", "px", "dev", thr = 0.5).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a")) // b never exits
  }

  test("zscoreReversion: time stop fires, held counts skipped null rows") {
    // enter at t=1 (z=-3); nulls at t=2..3 advance the clock; at t=4 held=3>=3
    val rows = Seq(
      ("p", 1L, 10.0, Some(-3.0)), ("p", 2L, 11.0, None),
      ("p", 3L, 12.0, None), ("p", 4L, 13.0, Some(-1.0)))
    val got = Backtest.zscoreReversion(rows.toDF("k", "t", "px", "z"),
      "k", "t", "px", "z", entryZ = 2.0, exitZ = 0.2, maxHold = 3).collect()
    assert(got.length == 1)
    assert(got(0).getInt(9) == 3) // held_rows
    assert(math.abs(got(0).getDouble(8) - 0.3) < 1e-12)
  }

  test("zscoreReversion: one-sided exit — long exits when z >= -exitZ") {
    val rows = Seq(
      ("p", 1L, 10.0, Some(-2.5)), ("p", 2L, 11.0, Some(-0.1)))
    val got = Backtest.zscoreReversion(rows.toDF("k", "t", "px", "z"),
      "k", "t", "px", "z", entryZ = 2.0, exitZ = 0.2, maxHold = 100).collect()
    assert(got.length == 1 && got(0).getString(1) == "long")
    assert(got(0).getDouble(7) == -0.1) // exit_z
  }

  test("zscoreReversion: short does not exit while z stays above exitZ") {
    val rows = Seq(
      ("p", 1L, 10.0, Some(2.5)), ("p", 2L, 11.0, Some(1.0)),
      ("p", 3L, 12.0, Some(0.1)))
    val got = Backtest.zscoreReversion(rows.toDF("k", "t", "px", "z"),
      "k", "t", "px", "z", entryZ = 2.0, exitZ = 0.2, maxHold = 100).collect()
    assert(got.length == 1)
    assert(got(0).getLong(3) == 0L || got(0).get(3) != null) // exits at t=3
    assert(got(0).getDouble(7) == 0.1)
  }
}
