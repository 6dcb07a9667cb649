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
