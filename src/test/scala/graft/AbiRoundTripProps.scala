package graft

import graft.evm.AbiCodec
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import java.math.BigInteger

/** Encode → decode round-trip over RANDOM ABI type trees (scalars,
  * dynamic/fixed arrays, tuples, nested up to depth 3) — the property
  * form of EvmSpec's hand-picked vectors. Pure JVM (no Spark job), so
  * it can afford many cases. */
object AbiRoundTripProps extends Properties("AbiRoundTrip") {

  // ---- type-tree generator (depth-bounded) ----
  private val scalarT: Gen[String] = Gen.frequency(
    9 -> Gen.oneOf(
      "uint256", "uint128", "uint8", "int256", "int24",
      "address", "bool", "bytes32", "string", "bytes"),
    // short fixed bytes: left-aligned in the word, decode keeps the
    // full padded word (see AbiCodec.decodeWord) — `same` pads
    1 -> Gen.choose(1, 31).map(n => s"bytes$n"))

  private def typeT(depth: Int): Gen[String] =
    if (depth <= 0) scalarT
    else Gen.frequency(
      4 -> scalarT,
      1 -> typeT(depth - 1).map(t => s"$t[]"),
      1 -> Gen.zip(typeT(depth - 1), Gen.choose(1, 3))
        .map { case (t, k) => s"$t[$k]" },
      1 -> Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, typeT(depth - 1)).map(ts => ts.mkString("(", ",", ")"))))

  // ---- value generator matching a type ----
  private val hexChars = Gen.oneOf("0123456789abcdef".toSeq)
  private def hexStr(n: Int): Gen[String] = Gen.listOfN(n, hexChars).map(_.mkString)

  private def valueFor(t: String): Gen[Any] = AbiCodec.arrayOf(t) match {
    case Some((elem, Some(k))) => Gen.listOfN(k, valueFor(elem)).map(_.toSeq)
    case Some((elem, None)) =>
      Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, valueFor(elem)).map(_.toSeq))
    case None => AbiCodec.tupleOf(t) match {
      case Some(cs) => Gen.sequence[Seq[Any], Any](cs.map(valueFor))
      case None => t match {
        case "bool" => Gen.oneOf(true, false)
        case "address" => hexStr(40).map("0x" + _)
        case "bytes32" => hexStr(64).map("0x" + _)
        case "string" => Gen.alphaNumStr.map(_.take(24))
        case "bytes" => Gen.choose(0, 40).flatMap(n => hexStr(2 * n).map("0x" + _))
        case b if b.startsWith("bytes") =>
          hexStr(2 * b.substring(5).toInt).map("0x" + _)
        case u if u.startsWith("uint") =>
          val bits = u.substring(4).toInt
          // keep within min(type range, 38 decimal digits) so the
          // DecimalType(38,0) policy round-trips losslessly
          Gen.choose(0L, Long.MaxValue).map(v =>
            BigInteger.valueOf(v).mod(BigInteger.TWO.pow(math.min(bits, 62))))
        case i if i.startsWith("int") =>
          val bits = i.substring(3).toInt
          val half = BigInteger.TWO.pow(math.min(bits, 62) - 1)
          Gen.choose(Long.MinValue + 1, Long.MaxValue).map(v =>
            BigInteger.valueOf(v).mod(half.shiftLeft(1)).subtract(half))
      }
    }
  }

  // ---- decoded-value comparison (decode returns BigDecimal / boxed) ----
  private def same(expected: Any, got: Any, t: String): Boolean =
    AbiCodec.arrayOf(t) match {
      case Some((elem, _)) =>
        val e = expected.asInstanceOf[Seq[Any]]
        val g = got.asInstanceOf[Array[Any]]
        e.length == g.length && e.zip(g).forall { case (x, y) => same(x, y, elem) }
      case None => AbiCodec.tupleOf(t) match {
        case Some(cs) =>
          val e = expected.asInstanceOf[Seq[Any]]
          val g = got.asInstanceOf[Array[Any]]
          e.length == g.length &&
            e.zip(g).zip(cs).forall { case ((x, y), c) => same(x, y, c) }
        case None => t match {
          case "bool" => got == expected
          case "address" | "bytes32" | "bytes" =>
            got == expected.asInstanceOf[String].toLowerCase
          case b if b.startsWith("bytes") =>
            // decode keeps the whole left-aligned word
            got == expected.asInstanceOf[String].toLowerCase
              .padTo(66, '0')
          case "string" => got == expected
          case _ => // uintN / intN → BigDecimal
            got.asInstanceOf[java.math.BigDecimal].toBigInteger ==
              expected.asInstanceOf[BigInteger]
        }
      }
    }

  private val typedValue: Gen[(Seq[String], Seq[Any])] = for {
    n <- Gen.choose(1, 4)
    ts <- Gen.listOfN(n, typeT(3))
    vs <- Gen.sequence[Seq[Any], Any](ts.map(valueFor))
  } yield (ts.toSeq, vs)

  property("decode(encode(v, T), T) == v for random type trees") =
    forAll(typedValue) { case (types, values) =>
      val data = AbiCodec.encodeData(values, types)
      val out = AbiCodec.decodeData(data, types)
      out.length == types.length &&
        values.zip(out).zip(types).forall { case ((v, o), t) => same(v, o, t) }
    }

  property("truncated payloads null fields, never throw") =
    forAll(typedValue, Gen.choose(0, 64)) { case ((types, values), keep) =>
      val data = AbiCodec.encodeData(values, types)
      val cut = java.util.Arrays.copyOf(data, math.min(keep, data.length))
      AbiCodec.decodeData(cut, types).length == types.length // no exception
    }
}
