package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Pairwise merge kernels for STORED sketch/bitmap partials — the
  * scalar (row-at-a-time) siblings of the aggregating mergers in
  * [[graft.functions]]. AggRewrite's insert-only delta fold needs them:
  * folding one CDC batch into a summary joins current partials against
  * batch partials row-by-row, so the merge must be a scalar BINARY ×
  * BINARY → BINARY expression inside whole-stage codegen, not an
  * Aggregator. Both kernels are associative, commutative, and
  * idempotent, which is exactly why the fold is sound for INSERT-ONLY
  * deltas (a union can only grow; a register max can only rise) and
  * refused when deletes are present. */
object MergeOps {

  /** Roaring-bitmap union of two serialized [[graft.functions.Bitmap64]]
    * payloads; canonical bytes out (container order is key-sorted). */
  def bitmapOr(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    graft.functions.Bitmap64.deserialize(a)
      .or(graft.functions.Bitmap64.deserialize(b)).serialize

  /** Per-register max of two HLL register arrays (m = 4096) — the same
    * merge [[graft.functions.HllSketch.merge]] performs, on copies. */
  def hllMax(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(a, math.max(a.length, b.length))
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xff) > (out(i) & 0xff)) out(i) = b(i)
      i += 1
    }
    out
  }
}

/** `bitmap_or(a, b)`: union of two stored exact-distinct bitmap
  * partials as a codegen'd scalar. */
case class BitmapOrExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_or needs two BINARY, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    MergeOps.bitmapOr(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MergeOps.bitmapOr($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapOrExpr =
    copy(left = newLeft, right = newRight)
}

/** `hll_reg_max(a, b)`: per-register max of two stored HLL sketch
  * partials as a codegen'd scalar. */
case class HllRegMaxExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hll_reg_max needs two BINARY, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    MergeOps.hllMax(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MergeOps.hllMax($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllRegMaxExpr =
    copy(left = newLeft, right = newRight)
}

object MergeExprs {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bitmap_or", exprs => BitmapOrExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_reg_max", exprs => HllRegMaxExpr(exprs(0), exprs(1)),
      "built-in")
  }

  def bitmapOr(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("bitmap_or", a, b)
  }

  def hllRegMax(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("hll_reg_max", a, b)
  }
}
