package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `kmv_distinct(hash long, k)` → double: the k-minimum-values distinct
  * estimate as a MERGEABLE aggregate — the production form of the
  * corpus-telemetry sketch (`DataQueries.corpusTelemetry`).
  *
  * Estimator (identical to the relational spelling and the DuckDB
  * oracle): keep the k smallest DISTINCT hash values; with fewer than k
  * distinct inputs the sketch IS the exact count, otherwise
  * est = round((k−1) · (2^60 / h_(k)), 2) where h_(k) is the k-th
  * smallest hash (inputs are 60-bit `TextOps.h64` values). The float
  * expression mirrors the relational form's association order
  * `(k−1) * (2^60 / h_k)` term-for-term, and rounding goes through the
  * same BigDecimal HALF_UP path as Spark's `round`, so expr and
  * relational results are bit-identical (KmvParitySpec pins this).
  *
  * Scale: the relational spelling shuffles one row per distinct
  * (group, hash) — at 100 TB that distinct shuffle is the whole job.
  * This aggregate ships a ≤k-entry sorted set per group per partition
  * (partial aggregation), merge = set union truncated to k, so shuffle
  * bytes are O(groups · k), independent of corpus size.
  */
case class KmvDistinctAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def prettyName: String = "kmv_distinct"

  private lazy val k: Int = kExpr.eval(null) match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"kmv_distinct: k must be a foldable integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (LongType, IntegerType) if kExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (long, foldable int)")
    }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // bounded insert: skip values that cannot enter a full sketch so the
    // common case (a full buffer, value above h_k) costs one comparison
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else {
      // term order mirrors the relational/oracle SQL exactly:
      // (k-1) * (2^60 / h_k), then Spark's round(x, 2) semantics
      val est = (k - 1).toDouble * (1152921504606846976.0 / buf.last().doubleValue())
      java.math.BigDecimal.valueOf(est)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `bottomk_sample(key long, value long, k)` → array<bigint>: the values
  * carried by the k lexicographically-smallest distinct (key, value)
  * pairs, returned sorted by VALUE ascending — an ORDER-INDEPENDENT
  * mergeable uniform sample when `key` is a hash of a unique row id
  * (`TextOps.h64(id)`). Rank statistics over the returned array are
  * the classic sampling-based ε-approximate quantiles: with k kept of
  * n rows, the value at sample rank ⌈q·k⌉ estimates the exact
  * quantile at rank ⌈q·n⌉ with error O(1/√k) in rank space —
  * `q_sample_quantiles` oracles both the sketch (replayed exactly —
  * hash order is engine-independent, unlike reservoir sampling) and
  * its observed rank error.
  *
  * Why not t-digest/KLL: those compress by INSERTION ORDER, so a
  * distributed run is nondeterministic across merge schedules and no
  * engine-independent oracle can replay them. Hash-bottom-k trades a
  * √-factor of accuracy for a sketch that is a pure FUNCTION of the
  * input set — same merge-anywhere O(groups·k) shuffle posture,
  * deterministic at any parallelism.
  *
  * Ties: (key, value) pairs are deduplicated; callers must supply
  * unique keys (a unique-id hash) for faithful uniform sampling. */
case class BottomKSampleAgg(
    keyExpr: Expression,
    valExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  override def prettyName: String = "bottomk_sample"

  private lazy val k: Int = kExpr.eval(null) match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"bottomk_sample: k must be a foldable integer, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (keyExpr.dataType, valExpr.dataType, kExpr.dataType) match {
      case (LongType, LongType, IntegerType) if kExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (long key, long value, foldable int k)")
    }

  override def children: Seq[Expression] = Seq(keyExpr, valExpr, kExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](
      implicitly[Ordering[(Long, Long)]])

  private def insert(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size() < k) { buf.add(p); () }
    else if (implicitly[Ordering[(Long, Long)]].lt(p, buf.last())) {
      if (buf.add(p)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val kv = keyExpr.eval(input)
    val vv = valExpr.eval(input)
    if (kv != null && vv != null)
      insert(buf, (kv.asInstanceOf[Long], vv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
                     other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val vals = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(vals)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSampleAgg =
    copy(keyExpr = newChildren(0), valExpr = newChildren(1), kExpr = newChildren(2))
}
