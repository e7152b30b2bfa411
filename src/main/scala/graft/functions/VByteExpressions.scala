package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.index.Codec

/** Analysis-time input-type validation shared by the graft expressions
  * (`ExpectsInputTypes` is private[sql] in Spark 4, so the same contract is
  * enforced through the public `checkInputDataTypes` hook): a mistyped call
  * like `token_count(<int>)` fails analysis with a clear message instead of
  * a ClassCastException on an executor at runtime.
  */
private[functions] trait GraftInputTypes { self: Expression =>
  def expectedInputTypes: Seq[DataType]

  override def checkInputDataTypes(): TypeCheckResult = {
    val mismatch = children.map(_.dataType).zip(expectedInputTypes).zipWithIndex
      .collectFirst { case ((got, want), i) if got != want => (i, got, want) }
    mismatch match {
      case Some((i, got, want)) => TypeCheckResult.TypeCheckFailure(
        s"argument ${i + 1} of $prettyName requires ${want.simpleString}, " +
          s"got ${got.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** Native Catalyst expressions for the posting codec — a custom `Expression`
  * with `doGenCode` (not a UDF), so decoding posting segments composes with
  * any SQL/DataFrame pipeline inside whole-stage codegen: the extension-point
  * tier (b) of the build guidance (compose built-ins < custom Expression <
  * custom plan < mapPartitions).
  *
  * SQL: `vbyte_decode_deltas(docBytes, n)` → array<bigint> of absolute docIds
  *      `vbyte_decode_ints(tfBytes, n)`    → array<int> of term frequencies
  */
case class VByteDecodeDeltas(left: Expression, right: Expression)
    extends BinaryExpression with GraftInputTypes {
  override def nullIntolerant: Boolean = true
  override def expectedInputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vbyte_decode_deltas"

  override protected def nullSafeEval(bytes: Any, n: Any): Any =
    new GenericArrayData(Codec.decodeDeltas(bytes.asInstanceOf[Array[Byte]],
      n.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.index.Codec.decodeDeltas($b, $n))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class VByteDecodeInts(left: Expression, right: Expression)
    extends BinaryExpression with GraftInputTypes {
  override def nullIntolerant: Boolean = true
  override def expectedInputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vbyte_decode_ints"

  override protected def nullSafeEval(bytes: Any, n: Any): Any =
    new GenericArrayData(Codec.decodeInts(bytes.asInstanceOf[Array[Byte]],
      n.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.index.Codec.decodeInts($b, $n))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `token_count(content)` ≡ `size(regexp_extract_all(lower(content),
  * '[a-z0-9_]+'))` — the tokenizer's document-length measure as a native
  * codegen'd Expression with a zero-allocation ASCII byte scan
  * (graft.index.Tokenize.tokenCount), so the index build's dlen column costs
  * a memory pass instead of a regex + token-array materialization.
  */
case class TokenCount(child: Expression)
    extends UnaryExpression with GraftInputTypes {
  override def nullIntolerant: Boolean = true
  override def expectedInputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(s: Any): Any =
    graft.index.Tokenize.tokenCount(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.index.Tokenize.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** SQL-registration surface; after `register(spark)` use
  * `expr("vbyte_decode_deltas(docBytes, n)")` from the Column API.
  */
object VByteFunctions {

  /** Runtime registration on an existing session (Verify/tests). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vbyte_decode_deltas", es => VByteDecodeDeltas(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vbyte_decode_ints", es => VByteDecodeInts(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_count", es => TokenCount(es(0)), "built-in")
  }
}

/** Session-builder extension — `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (the SparkSessionExtensions injection pattern).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vbyte_decode_deltas"),
      new ExpressionInfo(classOf[VByteDecodeDeltas].getName, "vbyte_decode_deltas"),
      es => VByteDecodeDeltas(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vbyte_decode_ints"),
      new ExpressionInfo(classOf[VByteDecodeInts].getName, "vbyte_decode_ints"),
      es => VByteDecodeInts(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      es => TokenCount(es(0))))
  }
}
