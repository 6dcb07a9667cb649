package graft

import org.apache.spark.sql.functions._
import graft.ops.{DataQueries, Hashing}

/** Engine-independent pin of the HLL calibration query: the whole
  * sketch (registers AND the double-arithmetic estimate) is replayed
  * driver-side in plain Scala from the raw fixture text and must match
  * the Spark result bit-for-bit — so `q_hll_err`'s determinism doesn't
  * rest on the DuckDB oracle alone. Plus the two laws the query's
  * scale story depends on: the register file is partitioning-invariant
  * (max is the merge), and the estimate lands within the published
  * ±1.04/√m relative-error band on the fixture. */
class HllSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** ρ = trailing-zero rank of the 51-bit residue, exactly as the
    * query and the oracle spell it. */
  private def rho(g: Long): Int = {
    val w = g >> 9
    if (w == 0L) 52 else java.lang.Long.numberOfTrailingZeros(w) + 1
  }

  private def driverReplay(): Map[String, (Long, Long, Long)] = {
    val rows = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val grams: Seq[(String, Long)] = rows.toSeq.flatMap { case (src, text) =>
      val tk = text.split("\\s+").filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3)
        .map(w => src -> Hashing.h64(w.mkString(" "))).toSeq
    }
    grams.groupBy(_._1).map { case (src, gs) =>
      val hs = gs.map(_._2)
      val regs = hs.groupBy(g => g & 511L).map { case (_, bucket) =>
        bucket.map(rho).max
      }
      // exact same arithmetic as the query: integer harmonic sum, then
      // IEEE-exact double products and one correctly-rounded divide
      val sHit = regs.map(r => 1L << (52 - r)).sum
      val sTotal = sHit + (512L - regs.size) * (1L << 52)
      val est = math.round(
        (719783e0 * 262144 * 4503599627370496e0) / (sTotal.toDouble * 1e6))
      (src, (hs.distinct.size.toLong, est, regs.size.toLong))
    }
  }

  test("hllErr equals a full driver-side replay, bit for bit") {
    val got = DataQueries.hllErr(spark, sf).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val want = driverReplay()
    assert(got.keySet == want.keySet)
    for ((src, w) <- want) assert(got(src) == w, s"source=$src")
  }

  test("register file is partitioning-invariant (max merges)") {
    def run(parts: Int) = {
      val docs = Tables.documents(spark, sf).repartition(parts)
      val grams = docs.select(col("source"),
          explode(call_function("shingle_h64s_all",
            graft.ops.TextOps.tokens(col("text")), lit(3))).as("g"))
      grams
        .withColumn("b", expr("g & 511"))
        .withColumn("rho", when(expr("shiftright(g, 9)") === 0, lit(52))
          .otherwise(expr(
            "bit_count((shiftright(g, 9) & -shiftright(g, 9)) - 1) + 1")))
        .groupBy("source", "b").agg(max("rho").as("r"))
        .orderBy("source", "b").collect().toSeq
    }
    assert(run(1) == run(17))
  }

  test("estimate sits inside the ±3·1.04/√m error band on the fixture") {
    val rows = DataQueries.hllErr(spark, sf).collect()
    assert(rows.nonEmpty)
    val band = 3.0 * 1.04 / math.sqrt(512.0)
    rows.foreach { r =>
      val (exact, err) = (r.getLong(1), r.getLong(3))
      assert(math.abs(err.toDouble / exact) < band,
        s"${r.getString(0)}: err=$err exact=$exact")
    }
  }
}
