package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hamming distance between two 64-bit
  * signatures (`Long.bitCount(a ^ b)`) — the verify kernel of SimHash
  * near-duplicate detection. Codegen emits a single xor + popcount
  * (an intrinsic on every modern JVM/CPU), so the pair-verification
  * loop stays branch-free inside whole-stage codegen; a Scala UDF here
  * would box both longs per pair. Oracle twin: DuckDB
  * `bit_count(xor(a, b))`.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  // strict BIGINT inputs (ImplicitCastInputTypes is private[sql], so SQL
  // callers cast narrower integrals explicitly)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hamming_dist needs two BIGINT, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_dist", exprs => HammingDistance(exprs(0), exprs(1)), "built-in")

  def hammingDist(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("hamming_dist", a, b)
  }
}
