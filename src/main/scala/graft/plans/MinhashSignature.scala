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
  * (`split` returns at least one element). Null ELEMENTS are skipped —
  * the same treatment `array_min` gives them in the composed form — and
  * an all-null array yields null like an empty one; SQL callers can
  * therefore pass ARRAY<BIGINT> with nullable slots without corrupting
  * the signature. The universal-hash family
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
    var used = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        used += 1
        val h = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val v = (h * as(k) + bs(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (used == 0) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", as, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val used = ctx.freshName("used")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $used = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    $used++;
         |    long $h = $c.getLong($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $v = ($h * $aRef[$k] + $bRef[$k]) % ${P}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |}
         |if ($used == 0) {
         |  ${ev.isNull} = true;
         |} else {
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

  /** Signature width when a SQL call omits k — the library-wide value
    * the whole dedup subsystem is tuned for (DedupOps.numHashes aliases
    * this, keeping one source of truth). */
  val DefaultK: Int = 12

  /** Evaluate the optional-k argument of a SQL `minhash_sig(hashes[, k])`
    * call: absent → [[DefaultK]]; an INT or BIGINT foldable literal →
    * its value; anything else is an analysis-time error (not an
    * IndexOutOfBounds/ClassCast at eval). */
  def resolveK(exprs: Seq[Expression], default: Int = DefaultK): Int = {
    if (exprs.isEmpty) throw new IllegalArgumentException(
      "minhash_sig needs at least one argument: minhash_sig(hashes[, k])")
    if (exprs.length == 1) default
    else exprs(1).eval() match {
      case i: java.lang.Integer if i >= 1 => i.intValue()
      case l: java.lang.Long
          if l >= 1 && l <= Int.MaxValue => l.intValue()
      case other => throw new IllegalArgumentException(
        s"minhash_sig k must be an INT/BIGINT literal >= 1, got $other")
    }
  }

  /** Temp-function registration with the SAME arity contract as the
    * GraftExtensions catalog entry — minhash_sig(hashes[, k]) — so a
    * session where the internal pipeline has run keeps honoring an
    * explicit k from SQL instead of silently ignoring it. */
  def register(spark: SparkSession, numHashes: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      // resolveK first: its arity message beats exprs.head's raw
      // NoSuchElementException on a zero-argument call
      exprs => { val k = resolveK(exprs, numHashes)
        MinhashSignature(exprs.head, k) },
      "built-in")

  def minhashSig(spark: SparkSession, hs: Column, numHashes: Int): Column = {
    register(spark, numHashes)
    call_function("minhash_sig", hs)
  }
}
