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
case class TokenizeGenerator(child: Expression, cjk: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("word", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      // lazy per-token (and, in cjk mode, per-bigram) emission — the
      // TableFunction.collect contract; no intermediate array
      new Iterator[InternalRow] {
        private var i = 0
        private val n = s.length
        private var tok: String = _
        private var bi = 0 // next bigram start within a CJK token
        private def skipSpaces(): Unit = { while (i < n && s.charAt(i) == ' ') i += 1 }
        private def advance(): Unit = {
          skipSpaces()
          if (i >= n) { tok = null; return }
          val start = i
          while (i < n && s.charAt(i) != ' ') i += 1
          tok = s.substring(start, i)
          bi = 0
        }
        advance()
        // same contract as TextOps.tokenizeMixed: all-ASCII or length<=1
        // tokens pass through whole, others emit character bigrams
        private def whole(t: String): Boolean =
          !cjk || t.length <= 1 || t.forall(_ < 0x80)
        def hasNext: Boolean = tok != null
        def next(): InternalRow = {
          val out =
            if (whole(tok)) { val t = tok; advance(); t }
            else {
              val b = tok.substring(bi, bi + 2)
              bi += 1
              if (bi >= tok.length - 1) advance()
              b
            }
          InternalRow(UTF8String.fromString(out))
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): TokenizeGenerator =
    copy(child = c)
}

object TokenizeGenerator {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_udtf", exprs => TokenizeGenerator(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_cjk_udtf",
      exprs => TokenizeGenerator(exprs.head, cjk = true), "built-in")
  }

  /** df.select(..., tokenize_udtf(text)) — the LATERAL TABLE call shape. */
  def tokens(spark: SparkSession, textCol: Column): Column = {
    register(spark)
    call_function("tokenize_udtf", textCol)
  }

  /** The CJK-capable variant — [[graft.operators.TextOps.tokenizeMixed]]
    * semantics as a lazy Generator. */
  def cjkTokens(spark: SparkSession, textCol: Column): Column = {
    register(spark)
    call_function("tokenize_cjk_udtf", textCol)
  }
}
