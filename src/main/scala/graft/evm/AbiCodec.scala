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

  /** `T[]` → Some((T, None)); `T[k]` → Some((T, Some(k))); else None. */
  private val ArrayRe = "^(.*)\\[([0-9]*)\\]$".r
  def arrayOf(t: String): Option[(String, Option[Int])] = t match {
    case ArrayRe(elem, "") => Some((elem, None))
    case ArrayRe(elem, k) => Some((elem, Some(k.toInt)))
    case _ => None
  }

  /** True when `t` is head-only (no offset-referenced tail). Per the
    * public ABI spec: string/bytes/`T[]` are dynamic; `T[k]` inherits
    * its element's staticness. */
  def isStatic(t: String): Boolean = t match {
    case "string" | "bytes" => false
    case ArrayRe(elem, "") => false
    case ArrayRe(elem, _) => isStatic(elem)
    case _ => true
  }

  /** Head width of `t` in 32-byte words: dynamic types hold one offset
    * word; a static `T[k]` occupies k element-heads in place. */
  def headWords(t: String): Int =
    if (!isStatic(t)) 1
    else arrayOf(t) match {
      case Some((elem, Some(k))) => k * headWords(elem)
      case _ => 1
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

  /** Decode `count` static elements of `elem` laid out word-aligned
    * starting at byte offset `base`. */
  private def staticElems(data: Array[Byte], base: Int, count: Int,
                          elem: String): Array[Any] = {
    val ew = headWords(elem)
    (0 until count).map { j =>
      val at = base + j * ew * Word
      arrayOf(elem) match {
        case Some((inner, Some(k))) => staticElems(data, at, k, inner)
        case _ => decodeWord(
          java.util.Arrays.copyOfRange(data, at, at + Word), elem)
      }
    }.toArray[Any]
  }

  /** Decode the non-indexed event payload (`log.Data`) against the
    * given head types — the full offset/length tail walk of the public
    * ABI spec (the reference gets this generically from go-ethereum,
    * parser.go:74-77). Heads advance by `headWords` per field (a static
    * `T[k]` sits k element-words in place); dynamic string/bytes/`T[]`
    * follow their head offset to a length-prefixed tail; `T[]`/`T[k]`
    * of static elements decode to Array[Any]. Any malformed access
    * yields null for that field (P7: malformed rows survive the scan). */
  def decodeData(data: Array[Byte], types: Seq[String]): Array[Any] = {
    val out = new Array[Any](types.length)
    if (data == null) return out
    var slot = 0 // running head position, in words
    var i = 0
    while (i < types.length) {
      val t = types(i)
      out(i) =
        try {
          if (isStatic(t)) {
            if (data.length < (slot + headWords(t)) * Word) null
            else arrayOf(t) match {
              case Some((elem, Some(k))) =>
                staticElems(data, slot * Word, k, elem)
              case _ => decodeWord(word(data, slot), t)
            }
          } else {
            val off = new BigInteger(1, word(data, slot)).intValueExact()
            arrayOf(t) match {
              case Some((elem, _)) =>
                val n = new BigInteger(1,
                  java.util.Arrays.copyOfRange(data, off, off + Word))
                  .intValueExact()
                // bounds check up front so a lying length nulls the
                // field instead of decoding garbage
                if (off + Word + n * headWords(elem) * Word > data.length) null
                else if (!isStatic(elem)) null // string[]/bytes[]: unsupported
                else staticElems(data, off + Word, n, elem)
              case None =>
                val len = new BigInteger(1,
                  java.util.Arrays.copyOfRange(data, off, off + Word))
                  .intValueExact()
                val body = java.util.Arrays.copyOfRange(
                  data, off + Word, off + Word + len)
                if (t == "string") new String(body, "UTF-8") else "0x" + hex(body)
            }
          }
        } catch { case _: Exception => null }
      slot += headWords(t)
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

  /** Encode a payload in the full head/tail layout (test/synthesis
    * helper): static fields in place (fixed arrays as k element words),
    * dynamic fields as an offset head word plus a length-prefixed tail.
    * Array values are Seq[Any]; string/bytes take String/Array[Byte]. */
  def encodeData(values: Seq[Any], types: Seq[String]): Array[Byte] = {
    val headSize = types.map(headWords(_) * Word).sum
    val heads = Seq.newBuilder[Array[Byte]]
    val tails = Seq.newBuilder[Array[Byte]]
    var tailLen = 0
    def static(v: Any, t: String): Array[Byte] = arrayOf(t) match {
      case Some((elem, Some(k))) =>
        val xs = v.asInstanceOf[Seq[Any]]
        require(xs.length == k, s"encodeData: $t needs $k elements")
        xs.flatMap(x => static(x, elem)).toArray
      case _ => encodeWord(v, t)
    }
    values.zip(types).foreach { case (v, t) =>
      if (isStatic(t)) heads += static(v, t)
      else {
        heads += encodeWord(BigInteger.valueOf(headSize.toLong + tailLen), "uint256")
        val tail: Array[Byte] = arrayOf(t) match {
          case Some((elem, None)) =>
            val xs = v.asInstanceOf[Seq[Any]]
            encodeWord(BigInteger.valueOf(xs.length.toLong), "uint256") ++
              xs.flatMap(x => static(x, elem))
          case _ =>
            val bytes = v match {
              case s: String if t == "string" => s.getBytes("UTF-8")
              case b: Array[Byte] => b
              case s: String => unhex(s)
            }
            val pad = new Array[Byte]((Word - bytes.length % Word) % Word)
            encodeWord(BigInteger.valueOf(bytes.length.toLong), "uint256") ++
              bytes ++ pad
        }
        tails += tail
        tailLen += tail.length
      }
    }
    (heads.result() ++ tails.result()).flatten.toArray
  }
}
