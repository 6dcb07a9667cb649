package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `gram_fx(vfx array<long>)` → array<long>: the uncentered second-
  * moment (Gram) matrix Σ v·vᵀ of fixed-point vectors, flattened
  * row-major (d² entries, d = input vector length).
  *
  * This replaces the declarative double-explode spelling of
  * [[VectorOps.pcaProject]]'s moment matrix: the explode materializes
  * N·d² rows through a hash aggregate (the measured cost of
  * q_pca_project), while this aggregate does the same N·d² integer
  * multiply-adds into ONE d²-long buffer per partition. Partials merge
  * by element-wise add, so the shuffle is O(partitions · d²) bytes
  * regardless of N — the mergeable-sketch posture (KmvAgg,
  * Uint256SumAgg) applied to the Gram matrix. Arithmetic is exactly
  * the explode spelling's: Σ vfx_i·vfx_j in BIGINT, so the DuckDB
  * oracle and every downstream fixed-point step are unchanged.
  *
  * Rows whose vector length differs from the first-seen d are a loud
  * error (a silent skip would bias the matrix); null vectors skip. */
case class GramFxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "gram_fx"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<long>, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] =
    child.eval(input) match {
      case null => buf
      case a: ArrayData =>
        val v = a.toLongArray()
        val d = v.length
        val g = if (buf.isEmpty) new Array[Long](d * d) else buf
        require(g.length == d * d,
          s"$prettyName: inconsistent vector length $d (matrix ${g.length})")
        var i = 0
        while (i < d) {
          val vi = v(i)
          val row = i * d
          var j = 0
          while (j < d) { g(row + j) += vi * v(j); j += 1 }
          i += 1
        }
        g
    }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      require(buf.length == other.length,
        s"$prettyName: merging matrices of different size")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramFxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramFxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramFxAgg =
    copy(child = newChildren(0))
}
