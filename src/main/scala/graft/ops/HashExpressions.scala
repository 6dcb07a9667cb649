package graft.ops

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM twins of the SQL-level hash primitives, bit-exact with the
  * column expressions the DuckDB oracles replay:
  * `h64(s)` == `conv(substring(md5(s),1,15),16,10)` — md5 of the UTF-8
  * bytes, first 15 lowercase hex chars parsed base-16 (< 2^60, always
  * positive). Centralizing them here lets whole fingerprint pipelines
  * (minhash, simhash, LSH plane weights) run as single tight-loop
  * expressions instead of explode → shuffle → re-group plans.
  */
object Hashing {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** md5-derived 60-bit hash of a string — equals TextOps.h64. */
  def h64(s: String): Long = h64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Unicode NFC composition with the ASCII identity fast path (see
    * [[NfcNormalizeExpr]]); called from generated code. */
  def nfc(u: UTF8String): UTF8String =
    if (u.numBytes == u.numChars) u // pure ASCII: NFC is the identity
    else UTF8String.fromString(java.text.Normalizer.normalize(
      u.toString, java.text.Normalizer.Form.NFC))

  /** Unicode codepoint → its single-character string (surrogate pair
    * for supplementary planes); called from generated code. The long is
    * range-checked BEFORE the int narrowing — without it a value like
    * 4294967393 (= 2³² + 97) silently truncates to 'a' — and invalid
    * codepoints (surrogate halves, > U+10FFFF, negatives) raise a
    * descriptive error, matching DuckDB chr's explicit out-of-range
    * failure rather than a bare IllegalArgumentException. */
  def uchr(cp: Long): UTF8String = {
    if (cp < 0L || cp > 0x10FFFFL || (cp >= 0xD800L && cp <= 0xDFFFL))
      throw new IllegalArgumentException(
        s"uchr: $cp is not a valid Unicode codepoint (expected 0..1114111, " +
          "excluding the surrogate range D800..DFFF)")
    UTF8String.fromString(new String(Character.toChars(cp.toInt)))
  }

  def h64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    // first 15 hex chars = 7.5 bytes: 7 full bytes + the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  /** Hex MD5 (lowercase) — used by tests to cross-check h64. */
  def md5Hex(s: String): String = {
    val d = md.get(); d.reset()
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .flatMap(b => Array(HexChars((b >> 4) & 0xf), HexChars(b & 0xf))).mkString
  }

  /** Deterministic LSH hyperplane weight for (plane, dim), identical to
    * VectorOps.planeWeight's column form: uniform in [-1e6, 1e6]. */
  def planeWeight(plane: Int, dim: Int): Long =
    h64(s"$plane,$dim") % 2000001L - 1000000L

  /** One hyperplane's weight vector, driver-precomputed (the column form
    * recomputed an md5 per (plane, dim) per ROW — a 512-entry constant). */
  def planeWeights(plane: Int, dims: Int): Array[Long] =
    Array.tabulate(dims)(d => planeWeight(plane, d))

  // -------------------------------------------------------------------
  // Static eval twins of the fingerprint expressions below, called from
  // BOTH interpreted eval and generated code (the NfcNormalizeExpr
  // pattern). Living here keeps each expression's doGenCode a one-line
  // defineCodeGen — and that, not the per-row boxing, is the real prize:
  // ONE CodegenFallback expression evicts its whole Project (every
  // sibling signal in the projection) from whole-stage codegen.
  // -------------------------------------------------------------------

  private def toStrings(arr: ArrayData): Array[String] = {
    val m = arr.numElements()
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    toks
  }

  private def joinGram(toks: Array[String], i: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder(toks(i))
    var j = 1
    while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
    sb.toString
  }

  /** [[ShingleH64sExpr]]: h64 of the DISTINCT n-gram shingles. */
  def shingleH64s(arr: ArrayData, n: Int): ArrayData = {
    val toks = toStrings(arr)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= m - n) { seen.add(joinGram(toks, i, n)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = h64(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** [[ShingleH64sAllExpr]]: h64 of ALL positional n-grams. */
  def shingleH64sAll(arr: ArrayData, n: Int): ArrayData = {
    val toks = toStrings(arr)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) { out(i) = h64(joinGram(toks, i, n)); i += 1 }
    new GenericArrayData(out)
  }

  /** [[ShinglePairsExpr]]: (h64, text) of ALL positional n-grams. */
  def shinglePairs(arr: ArrayData, n: Int): ArrayData = {
    val toks = toStrings(arr)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val s = joinGram(toks, i, n)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        h64(s), UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[CdcChunkH64sExpr]]: content-defined chunk hashes. */
  def cdcChunkH64s(arr: ArrayData, m: Int): ArrayData = {
    val n = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val tok = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      if (sb.length > 0) sb.append(' ')
      sb.append(tok)
      if (h64(tok) % m == 0) {
        out += h64(sb.toString)
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) out += h64(sb.toString)
    new GenericArrayData(out.toArray)
  }

  /** [[WinnowFpsExpr]]: winnowing fingerprints (min per w-window). */
  def winnowFps(arr: ArrayData, n: Int, w: Int): ArrayData = {
    val toks = toStrings(arr)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val len = m - n + 1
    val hs = new Array[Long](len)
    var i = 0
    while (i < len) { hs(i) = h64(joinGram(toks, i, n)); i += 1 }
    val win = math.min(w, len)
    val fps = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]() // monotone min-deque
    i = 0
    while (i < len) {
      while (!deque.isEmpty && hs(deque.peekLast()) >= hs(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - win) deque.pollFirst()
      if (i >= win - 1) fps.add(hs(deque.peekFirst()))
      i += 1
    }
    val out = new Array[Any](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  private val minhashCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def minhashAB(k: Int): (Array[Long], Array[Long]) =
    minhashCache.computeIfAbsent(k, kk => {
      val ps = DedupOps.minhashParams(kk)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  /** [[MinhashSigExpr]]: the k-wide MinHash signature. */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val (paramA, paramB) = minhashAB(k)
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i) % DedupOps.MinhashMod
        var j = 0
        while (j < k) {
          val v = (paramA(j) * h + paramB(j)) % DedupOps.MinhashMod
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(sig.map(Long.box(_): Any))
  }

  /** [[Simhash64Expr]]: the SimHash fingerprint. */
  def simhash64(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = h64(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          counts(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** [[RepStatsExpr]]: per-document repetition statistics. */
  def repStats(arr: ArrayData): InternalRow = {
    val toks = toStrings(arr)
    val m = toks.length
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < m) { distinct.add(toks(i)); i += 1 }
    def gramCounts(n: Int): java.util.HashMap[String, Int] = {
      val cnt = new java.util.HashMap[String, Int]()
      var j = 0
      while (j <= m - n) {
        cnt.merge(joinGram(toks, j, n), 1, Integer.sum(_, _))
        j += 1
      }
      cnt
    }
    var topBigram: String = null
    var topN = 0
    val bi = gramCounts(2).entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      if (e.getValue > topN ||
          (e.getValue == topN && topBigram != null &&
           e.getKey.compareTo(topBigram) < 0)) {
        topBigram = e.getKey
        topN = e.getValue
      }
    }
    var dup3 = 0L
    val tri = gramCounts(3).entrySet().iterator()
    while (tri.hasNext) {
      val e = tri.next()
      if (e.getValue >= 2) dup3 += e.getValue.toLong * e.getKey.length
    }
    InternalRow(distinct.size,
      if (topBigram == null) null else UTF8String.fromString(topBigram),
      topN, dup3)
  }

  /** [[DropRepWindowsExpr]]: within-document repeated-window removal. */
  def dropRepWindows(arr: ArrayData, n: Int): ArrayData = {
    val toks = toStrings(arr)
    val m = toks.length
    val covered = new Array[Boolean](m)
    if (m >= n) {
      val seen = new java.util.HashSet[java.lang.Long]()
      var i = 0
      while (i <= m - n) {
        if (!seen.add(h64(joinGram(toks, i, n)))) {
          var p = i
          while (p < i + n) { covered(p) = true; p += 1 }
        }
        i += 1
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](m)
    var i = 0
    while (i < m) {
      if (!covered(i)) out += UTF8String.fromString(toks(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** [[VecFixpExpr]]: fixed-point micro-unit quantization — per
    * element, Spark `round(x * 1e6)` HALF_UP semantics followed by the
    * long cast, replicated exactly: finite values go through
    * BigDecimal(v).setScale(0, HALF_UP) like Spark's Round of a
    * double. NaN/Infinity collapse via the pre-ANSI long-cast rule
    * (NaN → 0, ±Inf → Long.Min/MaxValue — scala Double.toLong): the
    * builtin spelling THROWS under ANSI there, but a poisoned element
    * must not kill a 100 TB scan, so vec_fixp is deliberately total
    * (pinned by PlanQualitySpec). */
  def vecFixp(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getDouble(i) * 1000000.0
        out(i) =
          if (v.isNaN || v.isInfinite) v.toLong
          else scala.math.BigDecimal(v)
            .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .toDouble.toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[SigAgreeExpr]]: equal non-null positions of two signatures
    * (zip_with semantics: positions past the shorter array are null
    * matches, never counted). */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var hits = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        hits += 1
      i += 1
    }
    hits
  }

  /** [[AlphaTokensExpr]]: tokens containing an ASCII letter — the
    * byte-scan twin of `rlike("[A-Za-z]")` (UTF-8 continuation bytes
    * are ≥ 0x80, so a letter byte can never be part of a multi-byte
    * char and the scan is encoding-safe). */
  def alphaTokens(arr: ArrayData): Int = {
    val m = arr.numElements()
    var hits = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val u = arr.getUTF8String(i)
        val nb = u.numBytes()
        var j = 0
        var found = false
        while (j < nb && !found) {
          val b = u.getByte(j)
          found = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
          j += 1
        }
        if (found) hits += 1
      }
      i += 1
    }
    hits
  }
}

/** shingle_h64s(tokens array<string>, n) → array<long>: h64 hashes of
  * the DISTINCT word n-gram shingles (space-joined), in first-occurrence
  * order. One tight JVM pass — the column form (`transform(sequence, i →
  * concat_ws(slice))` + `array_distinct` + md5) walks interpreted
  * higher-order-function trees per element, and Catalyst's collapsed
  * projections re-evaluate it per consumer; at 260k shingles that was
  * seconds, this is milliseconds. Distinctness is by shingle STRING
  * (then hashed), bit-exact with the oracle's order of operations. */
case class ShingleH64sExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "shingle_h64s"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, foldable int)")
    }
  private lazy val n: Int = right.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.shingleH64s(l.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.shingleH64s($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** shingle_h64s_all(tokens array<string>, n) → array<long>: h64 hashes
  * of ALL positional word n-gram shingles — duplicates kept, one entry
  * per window position ([[ShingleH64sExpr]] without the distinct).
  * Occurrence-counting consumers (n-gram diversity/TTR) need
  * multiplicity; at scale this also means 8-byte hashes ride the
  * distinct-count shuffle instead of shingle strings. */
case class ShingleH64sAllExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "shingle_h64s_all"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, foldable int)")
    }
  private lazy val n: Int = right.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.shingleH64sAll(l.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.shingleH64sAll($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** shingle_pairs(tokens array<string>, n) → array<struct<h:long,
  * s:string>>: every positional n-gram with its h64, one JVM pass —
  * for consumers that aggregate on the hash but need the text of a
  * FILTERED subset afterwards (top-ngram rehydration). The interpreted
  * `transform(sequence…, concat_ws(slice…))` + column-md5 spelling of
  * the same thing measured ~7× slower on the rehydration branch. */
case class ShinglePairsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "shingle_pairs"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, foldable int)")
    }
  private lazy val n: Int = right.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("s", StringType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.shinglePairs(l.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.shinglePairs($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cdc_chunk_h64s(tokens array<string>, m) → array<long>: h64 hashes
  * of CONTENT-DEFINED chunks — a chunk closes after every token whose
  * h64 is ≡ 0 (mod m), so expected chunk length is m tokens and chunk
  * boundaries are decided by content, not position. This is the
  * rsync/FastCDC idea at token granularity: inserting one token near
  * the head of a document shifts every FIXED window (passage dedup
  * finds nothing) but only perturbs the single chunk containing the
  * edit — every later boundary re-synchronizes. The trailing partial
  * chunk (after the last boundary) is kept. */
case class CdcChunkH64sExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "cdc_chunk_h64s"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, foldable int)")
    }
  private lazy val m: Int = right.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.cdcChunkH64s(l.asInstanceOf[ArrayData], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.cdcChunkH64s($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** winnow_fps(tokens array<string>, n, w) → array<long>: winnowing
  * fingerprints (Schleimer/Wilkerson/Aiken, the MOSS scheme) in one
  * pass: positional word n-gram shingles → h64 → min hash of every
  * w-length sliding window (monotone deque, O(len)) → distinct,
  * ascending. Guarantees a shared fingerprint for any common run of
  * ≥ w+n−1 tokens while keeping ~2/(w+1) of the hashes — the document
  * fingerprint that is robust to partial overlap, unlike the
  * whole-content hash. Fewer than n tokens → empty. */
case class WinnowFpsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "winnow_fps"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, foldable int, foldable int)")
    }
  private lazy val n: Int = second.eval(null).asInstanceOf[Int]
  private lazy val w: Int = third.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(t: Any, nv: Any, wv: Any): Any =
    Hashing.winnowFps(t.asInstanceOf[ArrayData], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.ops.Hashing.winnowFps($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression) =
    copy(first = f, second = s, third = t)
}

/** minhash_sig(shingle_hashes array<long>, k) → array<long>: the full
  * k-wide MinHash signature in one pass over the pre-hashed shingle set
  * (see [[ShingleH64sExpr]]). Bit-exact with the exploded column
  * pipeline (h = h64(s) mod M; sig_i = min (a_i·h + b_i) mod M) but
  * map-only: no explode, no (doc, i) shuffle — the signature a 100 TB
  * dedup run computes per document during the scan. An empty set yields
  * an all-null signature (callers filter empties first). */
case class MinhashSigExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<long>, foldable int)")
    }
  private lazy val k: Int = right.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.minhashSig(l.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.minhashSig($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** simhash64(tokens array<string>, bits) → long: SimHash fingerprint in
  * one pass (tokens with multiplicity; bit j set when Σ ±1 over token
  * hashes' bit j is positive). Bit-exact with the explode(tokens × bits)
  * aggregate pipeline but map-only. Empty token set → 0 sums → all bits
  * off → 0, matching the aggregate form's empty-group absence semantics
  * only when the caller filters empties — callers keep their guards. */
case class Simhash64Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, foldable int)")
    }
  private lazy val bits: Int = right.eval(null).asInstanceOf[Int]
  override def dataType: DataType = LongType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.simhash64(l.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.simhash64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** rep_stats(tokens array<string>) → struct: per-document repetition
  * statistics in one pass — the Gopher-style repetition quality signals
  * (duplicate-token fraction, most-frequent-2-gram mass, duplicated-
  * 3-gram mass) computed map-side with zero shuffles. The equivalent
  * relational form explodes every n-gram and re-groups by document —
  * two shuffles whose width is the token count; per-document stats
  * never need to leave the row.
  *
  * Fields (document with m tokens):
  *   - n_distinct: distinct token count
  *   - top_bigram: most frequent positional 2-gram (space-joined);
  *     ties pick the lexicographically smallest; null when m < 2
  *   - top_bigram_n: its occurrence count (0 when m < 2)
  *   - dup3_chars: Σ count·len(g) over positional 3-grams with count ≥ 2
  *     (the character mass inside duplicated 3-grams, overlaps counted
  *     as the Gopher rule does)
  */
case class RepStatsExpr(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "rep_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_bigram_n", IntegerType, nullable = false),
    StructField("dup3_chars", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    Hashing.repStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Hashing.repStats($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** vec_dot_long(array<long>, array<long>) → long: exact integer dot
  * product, whole-stage-codegen'd. The LSH projection hot path — fixed-
  * point quantized vectors against precomputed integer hyperplane
  * weights — where exactness makes bucket ids reproducible across
  * engines and summation orders. Null elements count as 0. */
case class VecDotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<long> inputs")
    }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
  // STATIC-CALL codegen, not an inline loop: bucketCol-style consumers
  // bake dozens of these per projection (16 tables × 6 planes = 96 call
  // sites), and an inlined 64-iteration loop per site pushes the
  // generated method past the JVM's ~8 KB JIT inlining/compilation
  // ceiling — the whole stage then runs as INTERPRETED bytecode
  // (measured ~13× on the multi-table bucketing projection at round
  // 14). One static call per site keeps the method small; the helper
  // itself JITs once.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.VecRt.dotLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** drop_repeated_windows(tokens array<string>, n) → array<string>: the
  * tokens that survive WITHIN-DOCUMENT repeated-window removal — any
  * position covered by a positional n-gram window whose h64 already
  * occurred EARLIER in the same document is dropped; survivors keep
  * their order. This is the document-local complement of the
  * corpus-level boilerplate strip ([[graft.ops.TextOps]] family): a
  * doc that repeats its own navigation block or chorus sheds the
  * copies in ONE map-side pass — no shuffle, no state, O(tokens) per
  * row. The 60-bit window hash is the same md5-derived h64 the DuckDB
  * oracle computes, so hash collisions (astronomically rare) are
  * REPRODUCED identically on both engines rather than diverging. */
case class DropRepWindowsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "drop_repeated_windows"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, foldable int)")
    }
  private lazy val n: Int = right.eval(null).asInstanceOf[Int]
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.dropRepWindows(l.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.dropRepWindows($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** nfc_normalize(string) → the Unicode NFC composition of the string —
  * the canonical form under which a composed "é" (U+00E9) and its
  * decomposed twin ("e" + U+0301) are the SAME text. Byte-exact dedup
  * keys must normalize first or visually-identical re-encodes slip
  * through. ASCII fast path: in UTF-8, byte count == char count iff
  * every char is ASCII, and NFC is the identity there — the common
  * case returns the input UTF8String untouched (no decode, no
  * allocation). Oracle twin: DuckDB's native `nfc_normalize` — an
  * independent engine's NFC table, not a re-spelling of ours. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string input")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any =
    Hashing.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Hashing.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** uchr(codepoint) → the one-character string for a Unicode codepoint.
  * Spark's builtin `chr` is byte-bound (mod-256 ASCII semantics), so it
  * cannot synthesize accents or CJK; DuckDB's `chr` is codepoint-native.
  * This expression is the Spark twin — it powers the deterministic
  * multilingual derivation ([[TextOps.textI18n]]) that routes non-ASCII
  * bytes through the cross-engine oracle gate. Codegen'd; folds on
  * literals so derivations over constants collapse at plan time. */
case class UchrExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName needs an integral codepoint")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "uchr"
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long    => Hashing.uchr(l)
    case i: java.lang.Integer => Hashing.uchr(i.toLong)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Hashing.uchr((long) $c)")
  override protected def withNewChildInternal(newChild: Expression): UchrExpr =
    copy(child = newChild)
}

/** sig_agree(array<long>, array<long>) → int: positions where both
  * signatures are non-null and equal — the MinHash agreement count
  * behind every est_jaccard. Value-identical to
  * `size(filter(zip_with(a, b, _ === _), m => m))` (a null on either
  * side yields a null match that filter drops), but that spelling is
  * two nested higher-order functions: one occurrence evicts the whole
  * estimation Project from whole-stage codegen. */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sig_agree"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<long> inputs")
    }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hashing.sigAgree(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.Hashing.sigAgree($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** JIT-friendly static kernels behind the vector expressions' codegen:
  * each call SITE in generated code is one static invocation instead of
  * an inlined 64-iteration loop, so projections with dozens of dot
  * sites (multi-table bucketing, PQ/k-means centroid literals) stay
  * under the JVM's ~8 KB method JIT ceiling. Semantics identical to the
  * interpreted `nullSafeEval`s: null elements skipped, min-length. */
object VecRt {
  def dotLong(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
          b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** vec_fixp(array<double>) → array<long>: the fixed-point micro-unit
  * vector round(x·1e6) HALF_UP — the quantization every integer-exact
  * LSH/PQ/gram path starts from. Value-identical to
  * `transform(v, x => round(x * 1e6).cast("long"))`, but transform is
  * a higher-order function whose one lambda evicts the whole bucket
  * projection (16 LSH tables × dot products) from whole-stage codegen. */
case class VecFixpExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_fixp"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<double>")
  }
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType)
  }
  override protected def nullSafeEval(input: Any): Any =
    Hashing.vecFixp(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Hashing.vecFixp($c)")
  override protected def withNewChildInternal(c: Expression): VecFixpExpr =
    copy(child = c)
}

/** alpha_tokens(tokens array<string>) → int: how many tokens contain
  * an ASCII letter — the Gopher alphabetic-word signal. Value-identical
  * to `size(filter(tk, t => t.rlike("[A-Za-z]")))`, but that spelling
  * is a higher-order function: one lambda in the signal projection
  * evicts the WHOLE Project from whole-stage codegen. Byte-scan is
  * encoding-safe (UTF-8 continuation bytes are ≥ 0x80). */
case class AlphaTokensExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "alpha_tokens"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>")
  }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    Hashing.alphaTokens(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Hashing.alphaTokens($c)")
  override protected def withNewChildInternal(c: Expression): AlphaTokensExpr =
    copy(child = c)
}

/** lang_scores(tokens array<string>) → struct<de,en,es,fr: double,
  * pred: string>: the whole language-ID heuristic in ONE pass over the
  * token array. The column formulation inlined every per-profile
  * stopword filter into the argmax tree (~13 references to `tokens()`
  * per row before subexpression elimination); here each token does one
  * hash probe into the profile bitmask table and the argmax (first
  * profile in [[TextOps.LangProfiles]] order whose score is ≥ every
  * other — the fold's exact tie-break) runs on four ints. Scores are
  * hits/numElements (null elements count in the denominator but never
  * hit, matching `filter`'s null-drop), 0.0 on an empty array.
  * Codegen'd via a static call into the companion's tight loop — the
  * same pattern as [[NfcNormalizeExpr]] — so the expression stays
  * inside whole-stage codegen and its five GetStructField consumers
  * CSE to ONE array pass (it was the family's only CodegenFallback;
  * interpreted, each projected field could re-run the token loop). */
case class LangScoresExpr(child: Expression)
    extends UnaryExpression {
  import LangScoresExpr._
  override def prettyName: String = "lang_scores"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<string>")
  }
  override def dataType: DataType = StructType(
    Langs.map(l => StructField(l, DoubleType, nullable = false)) :+
      StructField("pred", StringType, nullable = false))

  override protected def nullSafeEval(input: Any): Any =
    scores(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.LangScoresExpr.scores($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object LangScoresExpr {
  private[ops] val Langs: Array[String] = TextOps.LangProfiles.map(_._1).toArray
  private val PredStrs: Array[UTF8String] = Langs.map(UTF8String.fromString)

  /** The whole language-ID pass over one token array; called from both
    * the interpreted eval and generated code (static forwarder). */
  def scores(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    val hits = new Array[Int](Langs.length)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val bits = WordBits.get(arr.getUTF8String(i))
        if (bits != null) {
          var b = bits.intValue()
          while (b != 0) {
            val p = java.lang.Integer.numberOfTrailingZeros(b)
            hits(p) += 1
            b &= b - 1
          }
        }
      }
      i += 1
    }
    // first-wins argmax in profile order: score_i ≥ every score_j ⟺
    // hits_i ≥ hits_j (shared positive denominator); all-zero → first
    var best = 0
    i = 1
    while (i < hits.length) {
      if (hits(i) > hits(best)) best = i
      i += 1
    }
    val out = new Array[Any](Langs.length + 1)
    i = 0
    while (i < hits.length) {
      out(i) = if (m > 0) hits(i).toDouble / m else 0.0
      i += 1
    }
    out(Langs.length) = PredStrs(best)
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }
  /** token → bitmask of profiles containing it (a word can belong to
    * several languages, e.g. "la" in es and fr, "de" in es). */
  private val WordBits: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    TextOps.LangProfiles.zipWithIndex.foreach { case ((_, words), p) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        m.merge(k, Integer.valueOf(1 << p), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }
}
