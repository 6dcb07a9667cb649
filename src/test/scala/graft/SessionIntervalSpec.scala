package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextOps, TimeSeries}

/** Unit semantics for sessionize / intervalJoinAgg / gopher gate —
  * boundary behavior the sf-table oracles can't pin precisely. */
class SessionIntervalSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap strictly greater than gapSeconds starts a session") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 02:00:00"), 2L), // exactly 7200s → same session
      (1L, ts("2024-01-01 04:00:01"), 3L), // 7201s → new session
      (2L, ts("2024-01-01 00:00:00"), 4L)  // other key: own numbering
    ).toDF("user_id", "t", "event_id")
    val got = TimeSeries.sessionize(df, "user_id", "t", 7200, "event_id")
      .orderBy("event_id").select("session_no").as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("sessionize: equal timestamps break ties on tieBreak, one gap calc") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L),
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 09:00:00"), 3L)
    ).toDF("user_id", "t", "event_id")
    val got = TimeSeries.sessionize(df, "user_id", "t", 7200, "event_id")
      .orderBy("event_id").select("session_no").as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L, 2L))
  }

  test("intervalJoinAgg: half-open window [ts-lb, ts), bucket boundaries") {
    val probe = Seq((10L, 1L, ts("2024-01-01 02:00:00")))
      .toDF("event_id", "user_id", "t")
    val build = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1.0),  // == ts-lb → included
      (1L, ts("2024-01-01 01:59:59"), 2.0),  // in window, same bucket as probe
      (1L, ts("2024-01-01 02:00:00"), 4.0),  // == probe ts → EXCLUDED
      (1L, ts("2024-01-01 00:59:59"), 8.0),  // before window → excluded
      (2L, ts("2024-01-01 01:30:00"), 16.0)  // other key → excluded
    ).toDF("user_id", "bt", "v")
    val got = TimeSeries.intervalJoinAgg(probe, build, "user_id", "t", "bt",
      "v", 3600).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_prior") == 2L)
    assert(got(0).getAs[Double]("sum_prior") == 3.0)
  }

  test("intervalJoinAgg: probes with no matches survive with count 0") {
    val probe = Seq((1L, 5L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "t")
    val build = Seq((5L, ts("2024-01-01 00:00:00"), 1.0)).toDF("user_id", "bt", "v")
    val got = TimeSeries.intervalJoinAgg(probe, build, "user_id", "t", "bt",
      "v", 3600).collect()
    assert(got.length == 1 && got(0).getAs[Long]("n_prior") == 0L)
    assert(got(0).isNullAt(got(0).fieldIndex("sum_prior")))
  }

  test("sessionize/intervalJoinAgg: empty inputs produce empty outputs") {
    val e = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("user_id", "t", "event_id")
    assert(TimeSeries.sessionize(e, "user_id", "t", 10, "event_id").count() == 0)
    val b = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("user_id", "bt", "v")
    val p = Seq((1L, 2L, ts("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "t")
    val out = TimeSeries.intervalJoinAgg(p, b, "user_id", "t", "bt", "v", 60).collect()
    // empty build side: probe survives with zero matches
    assert(out.length == 1 && out(0).getAs[Long]("n_prior") == 0L)
  }

  test("sessionize: single-event users get session 1") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L),
      (2L, ts("2024-01-02 00:00:00"), 2L)).toDF("user_id", "t", "event_id")
    val got = TimeSeries.sessionize(df, "user_id", "t", 10, "event_id")
      .select("session_no").as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L))
  }

  test("gopher gate: thresholds and empty-text behavior") {
    val docs = Seq(
      (1L, ("the a of and is " + Seq.fill(20)("word").mkString(" "))), // keep
      (2L, "the a of " + Seq.fill(22)("word").mkString(" ")),          // keep (3 stops)
      (3L, "the " + Seq.fill(24)("word").mkString(" ")),               // 1 stop → drop
      (4L, "the a short text"),                                        // too few words
      (5L, "")                                                         // empty → drop
    ).toDF("doc_id", "text")
    val (n, m, af, sh) = TextOps.gopherSignals(col("text"))
    val got = docs.select(col("doc_id"),
        TextOps.gopherKeep(n, m, af, sh).as("keep"))
      .orderBy("doc_id").as[(Long, Boolean)].collect()
    assert(got.toSeq == Seq((1L, true), (2L, true), (3L, false),
      (4L, false), (5L, false)))
  }
}
