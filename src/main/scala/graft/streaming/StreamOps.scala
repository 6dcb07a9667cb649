package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the batch operators — the chain-tip
  * following mode the reference's roadmap promises (`README.md:202-208`)
  * but never implements. Same semantics as the batch ops where the
  * math allows; divergences are documented on each operator.
  *
  * Scale/correctness notes: logs arrive in block order per chain, so
  * per-key in-order delivery is the operating assumption for the FSM
  * (reorgs are out of scope, as in the reference). Watermarks bound
  * state for the windowed aggregations.
  */
object StreamOps {

  /** A1, streaming: last observation per (key, tumbling bucket). `max_by`
    * keeps the (ts, tiebreak)-greatest row per bucket incrementally —
    * identical result to the batch resampleLast once the watermark
    * closes a bucket. Emits in Append mode after watermark expiry. */
  def resampleLastStream(df: DataFrame, key: String, ts: String, value: String,
                         freq: String, tiebreak: String,
                         watermark: String = "1 hour"): DataFrame =
    df.withWatermark(ts, watermark)
      .groupBy(col(key), window(col(ts), s"1 $freq").as("w"))
      .agg(max_by(col(value), struct(col(ts), col(tiebreak))).as(value))
      .select(col(key), col("w.start").as("bucket"), col(value))

  /** Streaming tumbling-window mean/count per key (the monitoring-style
    * aggregation a chain-tip follower reports per chunk, C6). */
  def windowedStats(df: DataFrame, key: String, ts: String, value: String,
                    freq: String, watermark: String = "1 hour"): DataFrame =
    df.withWatermark(ts, watermark)
      .groupBy(col(key), window(col(ts), s"1 $freq").as("w"))
      .agg(avg(col(value)).as("mean"), count(lit(1)).as("n"))
      .select(col(key), col("w.start").as("bucket"), col("mean"), col("n"))

  /** FSM position state carried across micro-batches. */
  case class Position(side: String, entryTs: Long, entryPrice: Double)
  case class TickIn(key: String, ts: Long, price: Double, dev: Double)
  case class TradeOut(pool: String, side: String, entry_ts: Long, exit_ts: Long,
                      entry_price: Double, exit_price: Double, pct_return: Double)

  /** F1, streaming: the mean-reversion FSM as flatMapGroupsWithState —
    * the same transition rules as Backtest.meanReversion, with the open
    * position persisted in GroupState between micro-batches. Rows within
    * a batch are processed in event-time order; cross-batch order is the
    * source's responsibility (block-ordered logs). */
  def meanReversionStream(ticks: org.apache.spark.sql.Dataset[TickIn],
                          thr: Double): org.apache.spark.sql.Dataset[TradeOut] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState[Position, TradeOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[TickIn], state: GroupState[Position]) =>
          val sorted = rows.toSeq.sortBy(_.ts)
          var pos: Option[Position] = state.getOption
          val out = Seq.newBuilder[TradeOut]
          for (r <- sorted) {
            pos match {
              case None =>
                if (r.dev <= -thr) pos = Some(Position("long", r.ts, r.price))
                else if (r.dev >= thr) pos = Some(Position("short", r.ts, r.price))
              case Some(p) =>
                val exit = (p.side == "long" && r.dev >= 0) ||
                           (p.side == "short" && r.dev <= 0)
                if (exit) {
                  val ret = if (p.side == "long") (r.price - p.entryPrice) / p.entryPrice
                            else (p.entryPrice - r.price) / p.entryPrice
                  out += TradeOut(key, p.side, p.entryTs, r.ts,
                    p.entryPrice, r.price, ret)
                  pos = None
                }
            }
          }
          pos match {
            case Some(p) => state.update(p)
            case None => state.remove()
          }
          out.result().iterator
      }
  }
}
