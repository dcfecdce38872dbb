package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Pairwise merge kernels for STORED sketch/bitmap partials — the
  * scalar (row-at-a-time) siblings of the aggregating mergers in
  * [[graft.functions]]. AggRewrite's insert-only delta fold needs them:
  * folding one CDC batch into a summary joins current partials against
  * batch partials row-by-row, so the merge must be a scalar BINARY ×
  * BINARY → BINARY expression inside whole-stage codegen, not an
  * Aggregator. Both kernels are associative, commutative, and
  * idempotent, which is exactly why the fold is sound for INSERT-ONLY
  * groups (a union can only grow; a register max can only rise);
  * groups touched by a delete bypass the kernels entirely — AggRewrite
  * rebuilds their partials from the post-batch base at group grain. */
object MergeOps {

  /** Roaring-bitmap union of two serialized [[graft.functions.Bitmap64]]
    * payloads; canonical bytes out (container order is key-sorted). */
  def bitmapOr(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    graft.functions.Bitmap64.deserialize(a)
      .or(graft.functions.Bitmap64.deserialize(b)).serialize

  /** |A ∩ B| of two serialized bitmap partials — the audience-overlap
    * kernel (Doris BITMAP_AND_COUNT); no result container built. */
  def bitmapAndCount(a: Array[Byte], b: Array[Byte]): Long =
    graft.functions.Bitmap64.deserialize(a)
      .andCardinality(graft.functions.Bitmap64.deserialize(b))

  /** |A| of one serialized bitmap partial (Doris BITMAP_COUNT). */
  def bitmapCard(a: Array[Byte]): Long =
    graft.functions.Bitmap64.deserialize(a).cardinality

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

/** `bitmap_and_count(a, b)`: exact |A ∩ B| over two stored bitmap
  * partials as a codegen'd scalar — the serving kernel behind audience
  * overlap: the segment frames are metadata-sized (one row per
  * segment), so the whole overlap matrix runs without touching facts. */
case class BitmapAndCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_and_count needs two BINARY, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    MergeOps.bitmapAndCount(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MergeOps.bitmapAndCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCountExpr =
    copy(left = newLeft, right = newRight)
}

/** `bitmap_count(a)`: exact |A| of one stored bitmap partial. */
case class BitmapCardExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_count needs BINARY, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    MergeOps.bitmapCard(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.MergeOps.bitmapCard($a);")

  override protected def withNewChildInternal(
      newChild: Expression): BitmapCardExpr = copy(child = newChild)
}

/** `__graft_integral_id(child)`: analysis-time integral guard + widen
  * to long — the Column-level twin of AggRewrite's bitmap-registration
  * refusal. [[graft.api.Graft.exactDistinct]] routes its input through
  * this so a DOUBLE or STRING column REFUSES at analysis instead of
  * silently colliding under a cast (a function named exactDistinct must
  * never undercount without an error). */
case class IntegralIdExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ByteType |
        org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"exactDistinct needs an integral id column, got " +
            s"${other.catalogString} — a roaring bitmap is a set over " +
            "a 64-bit id space; hash or dictionary-encode other types " +
            "first (estimation: use Graft.hll)")
    }

  override def nullSafeEval(a: Any): Any =
    a.asInstanceOf[Number].longValue()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, a => s"(long) $a")

  override protected def withNewChildInternal(
      newChild: Expression): IntegralIdExpr = copy(child = newChild)
}

/** Column builders for the kernels — constructed DIRECTLY (via the
  * audited [[org.apache.spark.sql.graft.PlanDF]] bridge), never by
  * mutating the session's function registry: a maintenance fold must
  * not clobber a user's own `bitmap_or` temp function as a side
  * effect. */
object MergeExprs {
  import org.apache.spark.sql.graft.PlanDF

  def bitmapOr(a: Column, b: Column): Column =
    PlanDF.column(BitmapOrExpr(PlanDF.expression(a), PlanDF.expression(b)))

  def hllRegMax(a: Column, b: Column): Column =
    PlanDF.column(HllRegMaxExpr(PlanDF.expression(a), PlanDF.expression(b)))

  def integralId(c: Column): Column =
    PlanDF.column(IntegralIdExpr(PlanDF.expression(c)))

  def bitmapAndCount(a: Column, b: Column): Column =
    PlanDF.column(
      BitmapAndCountExpr(PlanDF.expression(a), PlanDF.expression(b)))

  def bitmapCount(c: Column): Column =
    PlanDF.column(BitmapCardExpr(PlanDF.expression(c)))
}
