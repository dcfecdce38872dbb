package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the FULL K-permutation minhash signature
  * of a document's token-hash array in ONE pass.
  *
  * The composed-builtin formulation (K × `array_min(transform(hs, ...))`,
  * DedupOps.mh) walks the hash array K times and allocates K transformed
  * copies per row; at K = 12 that is 12 array materializations per
  * document on the hottest shared stage of the whole dedup subsystem
  * (d2/d3/d5/c1/c12/c14 and the streaming crawl dedup all sit on it).
  * This expression keeps one running minimum per permutation in a local
  * long[] and updates all K inside a single loop over the hashes —
  * no intermediate arrays, no per-element lambda dispatch, and the
  * generated code stays inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the composed form for non-empty input
  * (min over `(h * a_k + b_k) % P` per permutation — same Long
  * arithmetic, so the DuckDB oracle twins are untouched); an empty
  * array yields null, and the tokenizer guarantees non-empty input
  * (`split` returns at least one element). The universal-hash family
  * (P prime < 2^32; a_k·h < 2^63) is defined HERE as the single source
  * of truth; DedupOps re-exports it for the oracle SQL.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import MinhashSignature._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs ARRAY<BIGINT>, got ${t.catalogString}")
  }

  private lazy val as: Array[Long] = (0 until numHashes).map(aK).toArray
  private lazy val bs: Array[Long] = (0 until numHashes).map(bK).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = (h * as(k) + bs(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", as, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $c.getLong($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $v = ($h * $aRef[$k] + $bRef[$k]) % ${P}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSignature = copy(child = newChild)
}

object MinhashSignature {
  /** Universal-hash constants: P prime < 2^32; h < 2^32 (md5-prefix
    * hashes), so a_k·h + b_k stays well inside 2^63. */
  val P: Long = 4294967291L
  def aK(k: Int): Long = 1000003L + 2L * k
  def bK(k: Int): Long = 12345L + 7L * k

  /** Temp-function registration with the SAME arity contract as the
    * GraftExtensions catalog entry — minhash_sig(hashes[, k]) — so a
    * session where the internal pipeline has run keeps honoring an
    * explicit k from SQL instead of silently ignoring it. */
  def register(spark: SparkSession, numHashes: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinhashSignature(exprs.head,
        if (exprs.length >= 2) exprs(1).eval().asInstanceOf[Int]
        else numHashes),
      "built-in")

  def minhashSig(spark: SparkSession, hs: Column, numHashes: Int): Column = {
    register(spark, numHashes)
    call_function("minhash_sig", hs)
  }
}
