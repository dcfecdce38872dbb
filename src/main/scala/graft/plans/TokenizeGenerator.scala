package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, col}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's KeywordUDTF as a genuine Catalyst `Generator` — the
  * table-function surface (`TableFunction<Row>.collect`,
  * KeywordUDTF.java:14-21, used via LATERAL TABLE in
  * DwsTrafficSourceKeywordPageViewWindow.java:50-52). A Generator emits
  * its output rows lazily per input row — no intermediate token array is
  * materialized, unlike split+explode (which builds the ArrayData first).
  *
  * The segmentation itself is the whitespace stand-in for the IK
  * segmenter (a jar dependency, reference pom.xml:205-209); segments are
  * produced by scanning the UTF8 bytes directly, skipping empty runs —
  * [[graft.operators.TextOps.tokenize]] semantics, minus the array
  * allocation. CodegenFallback is standard for Generators (generate()
  * is not whole-stage compiled; the surrounding project/filter still is).
  */
case class TokenizeGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("word", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      // lazy per-token emission — the TableFunction.collect contract
      new Iterator[InternalRow] {
        private var i = 0
        private val n = s.length
        private def skipSpaces(): Unit = { while (i < n && s.charAt(i) == ' ') i += 1 }
        skipSpaces()
        def hasNext: Boolean = i < n
        def next(): InternalRow = {
          val start = i
          while (i < n && s.charAt(i) != ' ') i += 1
          val tok = s.substring(start, i)
          skipSpaces()
          InternalRow(UTF8String.fromString(tok))
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): TokenizeGenerator =
    copy(child = c)
}

object TokenizeGenerator {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_udtf", exprs => TokenizeGenerator(exprs.head), "built-in")

  /** df.select(..., tokenize_udtf(text)) — the LATERAL TABLE call shape. */
  def tokens(spark: SparkSession, textCol: Column): Column = {
    register(spark)
    call_function("tokenize_udtf", textCol)
  }
}
