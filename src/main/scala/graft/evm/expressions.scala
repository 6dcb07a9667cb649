package graft.evm

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the EVM surface (SURVEY.md §4:
  * `keccak256`, `abi_decode_*`, `event_signature_hash`). Registered
  * through SparkSessionExtensions (see [[GraftExtensions]]) so they are
  * available both from the Column API and in SQL text.
  */

/** keccak256(binary) → 32-byte binary. Whole-stage-codegen'd via a
  * static call — stays inside the generated loop, no virtual dispatch. */
case class Keccak256Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs binary input")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "keccak256"
  // Expression.foldable defaults to FALSE — without this, a literal
  // keccak256('…') in SQL re-hashes every row instead of folding to a
  // constant at plan time (dataframe callers dodge it via Scala-side
  // Keccak, but the SQL surface must get the same plan-time hashing)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any =
    Keccak.hash256(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.evm.Keccak.hash256($c)")
  override protected def withNewChildInternal(newChild: Expression): Keccak256Expr =
    copy(child = newChild)
}

/** evm_topic0(signature string) → "0x…" topic hash string. Constant-
  * folds when the signature is a literal (the plan-time precomputation
  * the reference does in `indexer.go:54-88`). */
case class EventTopic0Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs string input")
  override def dataType: DataType = StringType
  override def prettyName: String = "evm_topic0"
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Keccak.eventTopic0(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.evm.Keccak.eventTopic0($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): EventTopic0Expr =
    copy(child = newChild)
}

/** abi_decode_word(word binary, 'type') → typed value (P5). The type
  * argument must be a foldable string; output type derives from it:
  * numeric → decimal(38,0), bool → boolean, else string. Decode failure
  * or overflow → null (compose `coalesce(abi_decode_word(t, …), hex(t))`
  * for the reference's raw-hex fallback, parser.go:100-102). */
case class AbiDecodeWordExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (binary, foldable string)")
  override def prettyName: String = "abi_decode_word"

  private lazy val abiType: String =
    right.eval(null).asInstanceOf[UTF8String].toString

  override def foldable: Boolean = left.foldable
  override lazy val dataType: DataType =
    // reference types in a topic are a keccak hash word → hex string
    // (uint256[] must not fall through to the uint branch)
    if (AbiCodec.arrayOf(abiType).isDefined ||
        AbiCodec.tupleOf(abiType).isDefined) StringType
    else abiType match {
      case t if t.startsWith("uint") || t.startsWith("int") => DecimalType(38, 0)
      case "bool" => BooleanType
      case _ => StringType
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val w = left.eval(input)
    if (w == null) null
    else AbiCodec.decodeWord(w.asInstanceOf[Array[Byte]], abiType) match {
      case null => null
      case s: String => UTF8String.fromString(s)
      case d: java.math.BigDecimal => Decimal(d, 38, 0)
      case b: java.lang.Boolean => b
      case o => o
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** abi_decode_data(data binary, 'type1,type2,…') → struct<arg0 …> (P4).
  * Static types are word-indexed; string/bytes follow head offsets.
  * Malformed fields decode to null instead of failing the row (P7). */
case class AbiDecodeDataExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (binary, foldable string)")
  override def prettyName: String = "abi_decode_data"

  // depth-0 split: tuple types carry commas of their own
  private lazy val types: Seq[String] =
    AbiCodec.splitTypes(right.eval(null).asInstanceOf[UTF8String].toString)

  private def fieldType(t: String): DataType = AbiCodec.arrayOf(t) match {
    case Some((elem, _)) => ArrayType(fieldType(elem))
    case None => AbiCodec.tupleOf(t) match {
      case Some(cs) => StructType(cs.zipWithIndex.map { case (c, i) =>
        StructField(s"f$i", fieldType(c))
      })
      case None => t match {
        case x if x.startsWith("uint") || x.startsWith("int") => DecimalType(38, 0)
        case "bool" => BooleanType
        case _ => StringType
      }
    }
  }

  override lazy val dataType: DataType = StructType(
    types.zipWithIndex.map { case (t, i) => StructField(s"arg$i", fieldType(t)) })

  // type-directed: a decoded Array[Any] is a Catalyst array for T[]/T[k]
  // but an InternalRow for tuples
  private def convert(v: Any, t: String): Any = v match {
    case null => null
    case arr: Array[Any] => AbiCodec.arrayOf(t) match {
      case Some((elem, _)) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          arr.map(convert(_, elem)))
      case None => AbiCodec.tupleOf(t) match {
        case Some(cs) => org.apache.spark.sql.catalyst.InternalRow.fromSeq(
          arr.toIndexedSeq.zip(cs).map { case (x, c) => convert(x, c) })
        case None => null
      }
    }
    case s: String => UTF8String.fromString(s)
    case bd: java.math.BigDecimal => Decimal(bd, 38, 0)
    case o => o
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = left.eval(input)
    if (d == null) return null
    val vals = AbiCodec.decodeData(d.asInstanceOf[Array[Byte]], types)
      .toIndexedSeq.zip(types).map { case (v, t) => convert(v, t) }
    org.apache.spark.sql.catalyst.InternalRow.fromSeq(vals)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ecrecover_sender(msg_hash binary, r binary, s binary, rec_id int) →
  * "0x…" signer address string, null on any invalid input (J2: the
  * best-effort tx_from enrichment, parser.go:152-159). CodegenFallback
  * is fine — the scalable usage recovers once per DISTINCT transaction
  * and broadcast-joins the result, keeping this off the per-log hot
  * path (the same restructuring as the block-timestamp cache, J1). */
case class EcRecoverExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "ecrecover_sender"
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 4 &&
        children.take(3).forall(_.dataType == BinaryType) &&
        children(3).dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (binary, binary, binary, int)")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    try {
      val addr = Secp256k1.recoverAddress(
        vs(0).asInstanceOf[Array[Byte]],
        new java.math.BigInteger(1, vs(1).asInstanceOf[Array[Byte]]),
        new java.math.BigInteger(1, vs(2).asInstanceOf[Array[Byte]]),
        vs(3).asInstanceOf[Int])
      if (addr == null) null else UTF8String.fromString(addr)
    } catch { case _: Exception => null }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EcRecoverExpr =
    copy(children = newChildren)
}

/** vec_dot(array<double>, array<double>) → double. The built-in route
  * (`aggregate(zip_with(...))`) is a CodegenFallback higher-order
  * function — interpreted per row, which dominates pairwise similarity
  * scans. This expression generates a tight primitive loop instead
  * (~20× on the brute-force cosine pass). Null elements are treated as
  * 0; null arrays propagate null. */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<double> inputs")
    }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         double $s = 0.0;
         for (int $i = 0; $i < $n; $i++) {
           if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
             $s += $a.getDouble($i) * $b.getDouble($i);
           }
         }
         ${ev.value} = $s;
       """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** SparkSessionExtensions installer: `GraftSession` wires this in, so
  * `expr("keccak256(x)")`, `evm_topic0`, `abi_decode_word`,
  * `abi_decode_data`, `vec_dot` work in SQL and the Column API alike. */
object GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("keccak256"),
      new ExpressionInfo(classOf[Keccak256Expr].getName, "keccak256"),
      (args: Seq[Expression]) => Keccak256Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("evm_topic0"),
      new ExpressionInfo(classOf[EventTopic0Expr].getName, "evm_topic0"),
      (args: Seq[Expression]) => EventTopic0Expr(args.head)))
    ext.injectFunction((FunctionIdentifier("abi_decode_word"),
      new ExpressionInfo(classOf[AbiDecodeWordExpr].getName, "abi_decode_word"),
      (args: Seq[Expression]) => AbiDecodeWordExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("abi_decode_data"),
      new ExpressionInfo(classOf[AbiDecodeDataExpr].getName, "abi_decode_data"),
      (args: Seq[Expression]) => AbiDecodeDataExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDotExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("ecrecover_sender"),
      new ExpressionInfo(classOf[EcRecoverExpr].getName, "ecrecover_sender"),
      (args: Seq[Expression]) => EcRecoverExpr(args)))
    ext.injectFunction((FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(classOf[graft.ops.VecDotLongExpr].getName, "vec_dot_long"),
      (args: Seq[Expression]) => graft.ops.VecDotLongExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("shingle_h64s"),
      new ExpressionInfo(classOf[graft.ops.ShingleH64sExpr].getName, "shingle_h64s"),
      (args: Seq[Expression]) => graft.ops.ShingleH64sExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("shingle_h64s_all"),
      new ExpressionInfo(classOf[graft.ops.ShingleH64sAllExpr].getName, "shingle_h64s_all"),
      (args: Seq[Expression]) => graft.ops.ShingleH64sAllExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("shingle_pairs"),
      new ExpressionInfo(classOf[graft.ops.ShinglePairsExpr].getName, "shingle_pairs"),
      (args: Seq[Expression]) => graft.ops.ShinglePairsExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("cdc_chunk_h64s"),
      new ExpressionInfo(classOf[graft.ops.CdcChunkH64sExpr].getName, "cdc_chunk_h64s"),
      (args: Seq[Expression]) => graft.ops.CdcChunkH64sExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.ops.MinhashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => graft.ops.MinhashSigExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[graft.ops.WinnowFpsExpr].getName, "winnow_fps"),
      (args: Seq[Expression]) => graft.ops.WinnowFpsExpr(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.ops.Simhash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => graft.ops.Simhash64Expr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("rep_stats"),
      new ExpressionInfo(classOf[graft.ops.RepStatsExpr].getName, "rep_stats"),
      (args: Seq[Expression]) => graft.ops.RepStatsExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("lang_scores"),
      new ExpressionInfo(classOf[graft.ops.LangScoresExpr].getName, "lang_scores"),
      (args: Seq[Expression]) => graft.ops.LangScoresExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("vec_fixp"),
      new ExpressionInfo(classOf[graft.ops.VecFixpExpr].getName, "vec_fixp"),
      (args: Seq[Expression]) => graft.ops.VecFixpExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("sig_agree"),
      new ExpressionInfo(classOf[graft.ops.SigAgreeExpr].getName, "sig_agree"),
      (args: Seq[Expression]) => graft.ops.SigAgreeExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("alpha_tokens"),
      new ExpressionInfo(classOf[graft.ops.AlphaTokensExpr].getName, "alpha_tokens"),
      (args: Seq[Expression]) => graft.ops.AlphaTokensExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[graft.ops.KmvDistinctAgg].getName, "kmv_distinct"),
      (args: Seq[Expression]) =>
        graft.ops.KmvDistinctAgg(args(0), args(1)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("drop_repeated_windows"),
      new ExpressionInfo(classOf[graft.ops.DropRepWindowsExpr].getName,
        "drop_repeated_windows"),
      (args: Seq[Expression]) =>
        graft.ops.DropRepWindowsExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("gram_fx"),
      new ExpressionInfo(classOf[graft.ops.GramFxAgg].getName, "gram_fx"),
      (args: Seq[Expression]) =>
        graft.ops.GramFxAgg(args(0)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("uint256_sum"),
      new ExpressionInfo(classOf[Uint256SumAgg].getName, "uint256_sum"),
      (args: Seq[Expression]) =>
        Uint256SumAgg(args(0)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("bottomk_sample"),
      new ExpressionInfo(classOf[graft.ops.BottomKSampleAgg].getName,
        "bottomk_sample"),
      (args: Seq[Expression]) =>
        graft.ops.BottomKSampleAgg(args(0), args(1), args(2))
          .toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.ops.NfcNormalizeExpr].getName,
        "nfc_normalize"),
      (args: Seq[Expression]) => graft.ops.NfcNormalizeExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("uchr"),
      new ExpressionInfo(classOf[graft.ops.UchrExpr].getName, "uchr"),
      (args: Seq[Expression]) => graft.ops.UchrExpr(args.head)))
  }
}
