package graft

import graft.pipelines.EthBot
import org.apache.spark.sql.functions._

/** Golden end-to-end: the composed pipeline vs a pinned run of the
  * reference's own stable_eth_meanrevert_bot.py on the same fixture
  * CSVs (src/test/resources/ethbot — includes malformed lines and a
  * positive-polarity pool). */
class EthBotSpec extends SparkSpec {

  private def resource(name: String): String =
    getClass.getResource(s"/ethbot/$name").getPath
  private lazy val dataDir = resource("data")

  private def pinned(name: String) =
    spark.read.option("header", "true").csv(resource(name))

  test("mean-reversion trades match the reference run exactly") {
    val got = EthBot.tradesMeanReversion(spark, dataDir, thrPct = 0.05)
      .orderBy("pool", "entry_ts").collect()
    val exp = pinned("trades_meanrev.csv")
      .orderBy("pool", "entry_ts").collect()
    assert(got.length == exp.length && got.length == 30)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0)) // pool
      assert(g.getString(1) == e.getString(1)) // side
      val expEpoch = java.time.LocalDateTime
        .parse(e.getString(2).replace(" ", "T").takeWhile(_ != '+'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
      assert(g.getTimestamp(2).toInstant.getEpochSecond == expEpoch)
      assert(math.abs(g.getDouble(6) - e.getString(6).toDouble) < 1e-9)
    }
  }

  test("z-score trades match the reference run exactly") {
    val got = EthBot.tradesZscore(spark, dataDir, lookback = 60,
        entryZ = 1.5, exitZ = 0.2, maxHold = 120)
      .orderBy("pool", "entry_ts").collect()
    val exp = pinned("trades_zscore.csv")
      .orderBy("pool", "entry_ts").collect()
    assert(got.length == exp.length && got.length == 60)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getString(1) == e.getString(1))
      assert(g.getInt(9) == e.getString(9).toInt) // held_rows
      assert(math.abs(g.getDouble(8) - e.getString(8).toDouble) < 1e-9) // pct
      assert(math.abs(g.getDouble(6) - e.getString(6).toDouble) < 1e-9) // entry_z
    }
  }

  test("monthly aggregation matches the reference total") {
    val trades = EthBot.tradesMeanReversion(spark, dataDir, thrPct = 0.05)
    val monthly = EthBot.monthlyReturns(trades).collect()
    assert(monthly.length == 1)
    assert(math.abs(monthly(0).getDouble(1) - 0.107032) < 1e-5)
  }
}
