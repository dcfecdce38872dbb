package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point for the graft-native expressions —
  * the library-deployment route: a cluster adds
  * `spark.sql.extensions=graft.plans.GraftExtensions` and every session
  * (including pure SQL ones) sees `cosine_sim` / `hamming_dist` as
  * catalog functions, no per-session registration call needed.
  * [[CosineSimilarity.cosineSim]] / [[HammingDistance.hammingDist]] keep
  * the per-session temp-function route for embedded/batch use; both
  * resolve to the same Expression classes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // the full 11-arg ctor is the supported (non-deprecated) form that
  // still carries the usage text into DESCRIBE FUNCTION output
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // materialized-aggregate navigation (AggRewrite.scala): sessions that
    // register summaries get raw-table aggregates rewritten onto them;
    // sessions without registrations pay one map lookup
    ext.injectOptimizerRule(s => AggRewrite.Rewrite(s))
    // zone-map file skipping (SkipIndex.scala): sessions that register
    // per-file stats get provably-empty files pruned at planning time;
    // sessions without registrations pay one map lookup
    ext.injectOptimizerRule(s => SkipIndex.Prune(s))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two ARRAY<DOUBLE>"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hamming_dist"),
      info("hamming_dist",
        "hamming_dist(a, b) - popcount(a XOR b) of two BIGINT signatures"),
      (children: Seq[Expression]) =>
        HammingDistance(children(0), children(1))))
    // the UDTF surface: catalog-visible table functions, usable from raw
    // SQL via LATERAL VIEW — the reference's `LATERAL TABLE(ik_analyze)`
    // call shape (DwsTrafficSourceKeywordPageViewWindow.java:50-52)
    ext.injectFunction((
      FunctionIdentifier("tokenize_udtf"),
      info("tokenize_udtf",
        "tokenize_udtf(text) - one row per whitespace token"),
      (children: Seq[Expression]) => TokenizeGenerator(children.head)))
    ext.injectFunction((
      FunctionIdentifier("tokenize_cjk_udtf"),
      info("tokenize_cjk_udtf",
        "tokenize_cjk_udtf(text) - whitespace tokens; CJK runs as bigrams"),
      (children: Seq[Expression]) =>
        TokenizeGenerator(children.head, cjk = true)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(hashes[, k]) - k-permutation minhash signature of " +
          "an ARRAY<BIGINT> in one pass (k defaults to " +
          s"${MinhashSignature.DefaultK})"),
      (children: Seq[Expression]) => {
        // resolveK first: its arity message beats children.head's raw
        // NoSuchElementException on a zero-argument call
        val k = MinhashSignature.resolveK(children)
        MinhashSignature(children.head, k)
      }))
  }
}
