package graft.evm

import java.math.BigInteger

/** Minimal ABI (Ethereum contract ABI) codec for event decoding —
  * word-aligned static types plus dynamic string/bytes, written from the
  * public ABI encoding spec. Mirrors what the reference gets from
  * go-ethereum's `UnpackIntoMap` / `ParseTopicsIntoMap`
  * (`internal/parser/parser.go:74-107`), re-scoped to the types its
  * shipped ABIs actually use (address, uint8..256, int24..256, bool,
  * bytes32, string, bytes).
  *
  * uint256 policy (SURVEY.md §7.4): numeric values are surfaced as
  * java.math.BigDecimal for Spark DecimalType(38,0) when they fit in 38
  * digits; larger values return null from the typed decoder — callers
  * keep the lossless raw-hex column alongside (`coalesce(decoded,
  * hex(word))`, the reference's raw-hex fallback at parser.go:100-102).
  */
object AbiCodec {

  final val Word = 32

  def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  def unhex(s: String): Array[Byte] = {
    val t = if (s.startsWith("0x")) s.substring(2) else s
    val out = new Array[Byte](t.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(t.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  private def word(data: Array[Byte], i: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(data, i * Word, (i + 1) * Word)

  /** True when `t` is head-only (fits one 32-byte word). */
  def isStatic(t: String): Boolean = t match {
    case "string" | "bytes" => false
    case _ => true
  }

  private val MaxDec38 = new BigInteger("9" * 38)

  /** Decode one 32-byte word as the given static ABI type.
    * Returns: address/bytes32 → "0x…" String, bool → java.lang.Boolean,
    * uintN/intN → java.math.BigDecimal (null when |v| needs > 38 digits).
    * Null (fallback to raw hex upstream) for unknown types. */
  def decodeWord(w: Array[Byte], abiType: String): Any = {
    if (w == null || w.length != Word) return null
    abiType match {
      case "address" =>
        "0x" + hex(java.util.Arrays.copyOfRange(w, 12, 32))
      case "bool" =>
        java.lang.Boolean.valueOf(w(31) != 0)
      case t if t.startsWith("uint") =>
        val v = new BigInteger(1, w)
        if (v.compareTo(MaxDec38) > 0) null else new java.math.BigDecimal(v)
      case t if t.startsWith("int") =>
        val v = new BigInteger(w) // two's complement, signed
        if (v.abs.compareTo(MaxDec38) > 0) null else new java.math.BigDecimal(v)
      case t if t.startsWith("bytes") && t.length > 5 =>
        "0x" + hex(w) // bytesN: left-aligned, keep the full word
      case _ => null
    }
  }

  /** Decode the non-indexed event payload (`log.Data`) against the given
    * head types. Static types read in place; dynamic string/bytes follow
    * the head offset to a length-prefixed tail. Any malformed access
    * yields null for that field (P7: malformed rows survive the scan). */
  def decodeData(data: Array[Byte], types: Seq[String]): Array[Any] = {
    val out = new Array[Any](types.length)
    if (data == null) return out
    var i = 0
    while (i < types.length) {
      out(i) =
        try {
          val t = types(i)
          if (isStatic(t)) {
            if (data.length < (i + 1) * Word) null else decodeWord(word(data, i), t)
          } else {
            val off = new BigInteger(1, word(data, i)).intValueExact()
            val len = new BigInteger(1,
              java.util.Arrays.copyOfRange(data, off, off + Word)).intValueExact()
            val body = java.util.Arrays.copyOfRange(data, off + Word, off + Word + len)
            if (t == "string") new String(body, "UTF-8") else "0x" + hex(body)
          }
        } catch { case _: Exception => null }
      i += 1
    }
    out
  }

  /** Encode one value as a 32-byte ABI word (test/synthesis helper). */
  def encodeWord(value: Any, abiType: String): Array[Byte] = {
    val w = new Array[Byte](Word)
    abiType match {
      case "address" =>
        val b = unhex(value.toString)
        System.arraycopy(b, 0, w, 32 - b.length, b.length)
      case "bool" =>
        w(31) = if (value.asInstanceOf[Boolean]) 1 else 0
      case t if t.startsWith("uint") || t.startsWith("int") =>
        val v = value match {
          case b: BigInteger => b
          case b: BigInt => b.bigInteger
          case n: Number => BigInteger.valueOf(n.longValue())
        }
        val b = v.toByteArray // big-endian two's complement
        val src = if (b.length > Word) java.util.Arrays.copyOfRange(b, b.length - Word, b.length) else b
        if (v.signum() < 0) java.util.Arrays.fill(w, 0xff.toByte)
        System.arraycopy(src, 0, w, Word - src.length, src.length)
      case _ =>
        throw new IllegalArgumentException(s"encodeWord: unsupported $abiType")
    }
    w
  }

  /** Encode a static-typed payload (concatenated words). */
  def encodeData(values: Seq[Any], types: Seq[String]): Array[Byte] =
    values.zip(types).flatMap { case (v, t) => encodeWord(v, t) }.toArray
}
