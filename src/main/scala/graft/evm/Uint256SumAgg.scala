package graft.evm

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `uint256_sum(word binary)` → string: exact full-range aggregation of
  * 32-byte big-endian uint256 words, evaluated as the decimal string of
  * the arbitrary-precision sum.
  *
  * This closes SURVEY §7.4's gap: `abi_decode_data` yields null for
  * values beyond DecimalType(38,0) (with `data_hex` as the lossless
  * shadow), so a user summing raw Transfer values hit silent nulls at
  * whale-scale amounts. This aggregate consumes the raw word itself —
  * no precision cliff at any magnitude (the sum of 2^63 max-uint256
  * values still has only ~97 digits).
  *
  * Mergeable like [[graft.ops.KmvDistinctAgg]]: partial sums are one
  * BigInteger per group per partition (map-side combine), merge is
  * BigInteger.add, so shuffle bytes are O(groups · ~40 bytes)
  * regardless of row count. Null / wrong-length words are skipped
  * (the malformed-row policy P7: skip, don't poison the group). */
case class Uint256SumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BigInteger] {

  override def prettyName: String = "uint256_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary 32-byte word, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BigInteger = BigInteger.ZERO

  override def update(buf: BigInteger, input: InternalRow): BigInteger =
    child.eval(input) match {
      case bytes: Array[Byte] if bytes.length == 32 =>
        buf.add(new BigInteger(1, bytes)) // 1 = always non-negative
      case _ => buf // null or malformed length: skip (P7)
    }

  override def merge(buf: BigInteger, other: BigInteger): BigInteger =
    buf.add(other)

  override def eval(buf: BigInteger): Any =
    UTF8String.fromString(buf.toString)

  override def serialize(buf: BigInteger): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): BigInteger =
    new BigInteger(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): Uint256SumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Uint256SumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Uint256SumAgg =
    copy(child = newChildren(0))
}
