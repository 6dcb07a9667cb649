package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Sequential trade-FSM backtests (SURVEY.md §2.6, F1/F2) —
  * `analytics/stable_eth_meanrevert_bot.py:131-178` (mean-reversion) and
  * `:182-251` (z-score with time stop).
  *
  * The reference walks the whole price matrix row-by-row in Python. Here
  * each pool's walk is an independent ordered fold, so the operator is a
  * `groupByKey(pool).flatMapGroups` — state per key is O(1) (one open
  * position), work is distributed across keys, and only one shuffle (on
  * the key) happens. The group's rows are sorted in-task by timestamp;
  * a key's series must fit a task (grid length × ~32B — a 10-year 10s
  * grid is ~250 MB, within executor memory; beyond that, split the fold
  * into epoch chunks carrying boundary state).
  */
object Backtest {

  private def tradeSchema(tsType: DataType) = StructType(Seq(
    StructField("pool", StringType), StructField("side", StringType),
    StructField("entry_ts", tsType), StructField("exit_ts", tsType),
    StructField("entry_price", DoubleType), StructField("exit_price", DoubleType),
    StructField("pct_return", DoubleType)))

  private def zTradeSchema(tsType: DataType) = StructType(Seq(
    StructField("pool", StringType), StructField("side", StringType),
    StructField("entry_ts", tsType), StructField("exit_ts", tsType),
    StructField("entry_price", DoubleType), StructField("exit_price", DoubleType),
    StructField("entry_z", DoubleType), StructField("exit_z", DoubleType),
    StructField("pct_return", DoubleType), StructField("held_rows", IntegerType)))

  private def tsKey(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      val i = t.toInstant; i.getEpochSecond * 1000000000L + i.getNano
    case n: java.lang.Number => n.longValue()
    case null => Long.MinValue
    case o => o.hashCode().toLong
  }

  /** F1: mean-reversion FSM (`simulate_mean_reversion`, ref `:131-178`).
    *
    * Input: one row per (pool, ts) with `price` and `dev` (fractional
    * deviation vs consensus). Per pool, chronologically: while flat,
    * `dev <= -thr` opens LONG and `dev >= thr` opens SHORT (entry rows
    * make no exit decision); while positioned, LONG closes when
    * `dev >= 0`, SHORT when `dev <= 0`. Returns the trades table;
    * positions never closed by end-of-data are discarded, as in the
    * reference. `thr` is a fraction (reference takes percent/100).
    */
  def meanReversion(df: DataFrame, key: String, ts: String, price: String,
                    dev: String, thr: Double): DataFrame = {
    implicit val enc = Encoders.row(tradeSchema(df.schema(ts).dataType))
    implicit val keyEnc = Encoders.STRING
    import org.apache.spark.sql.functions.col
    df.select(col(key).cast("string"), col(ts), col(price).cast("double"),
        col(dev).cast("double"))
      .groupByKey((r: Row) => r.getString(0))
      .flatMapGroups { (pool: String, rows: Iterator[Row]) =>
        val sorted = rows.toArray.sortBy(r => tsKey(r.get(1)))
        var side: String = null
        var entryTs: Any = null
        var entryPrice = 0.0
        val out = Array.newBuilder[Row]
        for (r <- sorted) {
          if (!r.isNullAt(2) && !r.isNullAt(3)) {
            val p = r.getDouble(2); val d = r.getDouble(3)
            if (side == null) {
              if (d <= -thr) { side = "long"; entryTs = r.get(1); entryPrice = p }
              else if (d >= thr) { side = "short"; entryTs = r.get(1); entryPrice = p }
            } else if ((side == "long" && d >= 0) || (side == "short" && d <= 0)) {
              val ret = if (side == "long") (p - entryPrice) / entryPrice
                        else (entryPrice - p) / entryPrice
              out += Row(pool, side, entryTs, r.get(1), entryPrice, p, ret)
              side = null
            }
          }
        }
        out.result().iterator
      }
  }

  /** F2: z-score reversion FSM with one-sided exits and a time stop
    * (`simulate_zscore_reversion`, ref `:182-251`).
    *
    * Per pool, chronologically, with `idx` counting every grid row (so
    * warm-up rows with null z still advance the hold clock, matching the
    * reference's global row index): null z rows are skipped; while flat,
    * `z <= -entryZ` opens LONG, `z >= entryZ` opens SHORT; while
    * positioned, LONG exits when `z >= -exitZ`, SHORT when `z <= exitZ`,
    * either exits when `held = idx - entry_idx >= maxHold`.
    */
  def zscoreReversion(df: DataFrame, key: String, ts: String, price: String,
                      z: String, entryZ: Double, exitZ: Double,
                      maxHold: Int): DataFrame = {
    implicit val enc = Encoders.row(zTradeSchema(df.schema(ts).dataType))
    implicit val keyEnc = Encoders.STRING
    import org.apache.spark.sql.functions.col
    df.select(col(key).cast("string"), col(ts), col(price).cast("double"),
        col(z).cast("double"))
      .groupByKey((r: Row) => r.getString(0))
      .flatMapGroups { (pool: String, rows: Iterator[Row]) =>
        val sorted = rows.toArray.sortBy(r => tsKey(r.get(1)))
        var side: String = null
        var entryIdx = 0
        var entryTs: Any = null
        var entryPrice = 0.0
        var entryZv = 0.0
        val out = Array.newBuilder[Row]
        var idx = 0
        for (r <- sorted) {
          if (!r.isNullAt(2) && !r.isNullAt(3) && !r.getDouble(3).isNaN) {
            val zv = r.getDouble(3); val p = r.getDouble(2)
            if (side == null) {
              if (zv <= -entryZ) {
                side = "long"; entryIdx = idx; entryTs = r.get(1); entryPrice = p; entryZv = zv
              } else if (zv >= entryZ) {
                side = "short"; entryIdx = idx; entryTs = r.get(1); entryPrice = p; entryZv = zv
              }
            } else {
              val held = idx - entryIdx
              val exit = (side == "long" && zv >= -exitZ) ||
                         (side == "short" && zv <= exitZ) || held >= maxHold
              if (exit) {
                val ret = if (side == "long") (p - entryPrice) / entryPrice
                          else (entryPrice - p) / entryPrice
                out += Row(pool, side, entryTs, r.get(1), entryPrice, p,
                  entryZv, zv, ret, held)
                side = null
              }
            }
          }
          idx += 1
        }
        out.result().iterator
      }
  }
}
