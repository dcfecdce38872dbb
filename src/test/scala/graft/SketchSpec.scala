package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.CmsSketch
import graft.operators.{SketchOps, TextOps}

/** Sketch + chunking invariants beyond the oracle hash: the CMS
  * Aggregator equals the declarative bucket-sum matrix (which is what
  * the t17 oracle replays), is partition-order independent, and keeps
  * its one-sided guarantee; c13 chunks tile every document exactly. */
class SketchSpec extends SparkSuite {

  private def tokens = Tables(spark, sf, "documents")
    .select(explode(filter(TextOps.tokenize(lower(col("text"))),
      t => t =!= "")).as("tok"))

  test("cms: aggregator sketch == declarative bucket-sum matrix") {
    import spark.implicits._
    val agg = new CmsSketch().toColumn
    val sketch = tokens.repartition(7).as[String].select(agg).head()
    // declarative twin: counter[i][b] = sum of true counts per bucket
    val mat = tokens.groupBy(col("tok")).agg(count(lit(1)).as("ct"))
      .select(col("tok"), col("ct"),
        explode(sequence(lit(0), lit(CmsSketch.depth - 1))).as("i"))
      .withColumn("b", SketchOps.bucketCol(col("i"), col("tok")))
      .groupBy(col("i"), col("b")).agg(sum(col("ct")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val bb = java.nio.ByteBuffer.wrap(sketch)
    for (i <- 0 until CmsSketch.depth; b <- 0 until CmsSketch.width) {
      val cell = bb.getLong((i * CmsSketch.width + b) * 8)
      assert(cell == mat.getOrElse((i, b.toLong), 0L),
        s"counter[$i][$b] mismatch")
    }
  }

  test("cms: partition layout does not change the sketch (mergeable)") {
    import spark.implicits._
    val agg = new CmsSketch().toColumn
    val a = tokens.repartition(3).as[String].select(agg).head()
    val b = tokens.repartition(11).as[String].select(agg).head()
    assert(java.util.Arrays.equals(a, b))
  }

  test("cms: estimate >= true count for EVERY token (one-sided)") {
    import spark.implicits._
    val agg = new CmsSketch().toColumn
    val sketch = tokens.as[String].select(agg).head()
    val truth = tokens.groupBy(col("tok")).agg(count(lit(1)).as("ct"))
      .collect()
    truth.foreach { r =>
      val (tok, ct) = (r.getString(0), r.getLong(1))
      assert(CmsSketch.estimate(sketch, tok) >= ct, s"undercount for $tok")
    }
    // and the t17 query's top-20 carries the same contract
    assert(q("t17_cms_heavy_hitters").filter(!col("one_sided_ok"))
      .count() == 0)
  }

  test("c13: chunks tile each document exactly with stride overlap") {
    val c = q("c13_rag_chunks")
    val perDoc = c.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      max(col("tok_start") + col("tok_len")).as("covered"),
      min(col("tok_start")).as("first_start"),
      max(col("chunk_idx")).as("max_idx"),
      min(col("tok_len")).as("min_len"),
      max(col("tok_len")).as("max_len"))
    val n = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(filter(TextOps.tokenize(lower(col("text"))), t => t =!= ""))
          .cast(LongType).as("n"))
      .filter(col("n") > 0)
    val joined = perDoc.join(n, "doc_id")
    // full coverage, 0-based contiguous indexes, len bounds
    assert(joined.filter(col("covered") =!= col("n")).count() == 0)
    assert(joined.filter(col("first_start") =!= 0).count() == 0)
    assert(joined.filter(col("max_idx") =!= col("n_chunks") - 1)
      .count() == 0)
    assert(joined.filter(col("min_len") < 1 ||
      col("max_len") > SketchOps.chunkSize).count() == 0)
    // consecutive chunks overlap by exactly chunkSize - chunkStride
    // except possibly the short last chunk
    val overlapBad = c.filter(col("chunk_idx") > 0)
      .filter(col("tok_start") =!=
        col("chunk_idx") * SketchOps.chunkStride)
    assert(overlapBad.count() == 0)
    // no shuffle in the chunking plan: pure map-side fan-out
    val plan = c.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "c13 should not shuffle")
  }

  test("a26: histogram aggregator == declarative bins; picks agree") {
    import spark.implicits._
    import graft.functions.HistogramSketch
    val prices = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_totalprice"))
    // out-of-domain inputs clamp instead of crashing the aggregator
    assert(HistogramSketch.bin(-5.0) == 0)
    assert(HistogramSketch.bin(1e12) == HistogramSketch.numBins - 1)
    val agg = new HistogramSketch().toColumn
    val s3 = prices.repartition(3).as[Double].select(agg).head()
    val s11 = prices.repartition(11).as[Double].select(agg).head()
    assert(java.util.Arrays.equals(s3, s11)) // mergeable / layout-free
    val counts = HistogramSketch.unpack(s3)
    // bins equal the declarative twin's
    val twin = prices
      .select(least(greatest(
        floor(col("o_totalprice") / HistogramSketch.binWidth), lit(0)),
        lit(HistogramSketch.numBins - 1)).cast(LongType).as("bin"))
      .groupBy("bin").count().collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    counts.indices.foreach(i =>
      assert(counts(i) == twin.getOrElse(i, 0L), s"bin $i mismatch"))
    // sketch-side percentile picks equal the a26 query row
    val row = q("a26_hist_percentiles")
      .filter(col("priority") === "1-URGENT").head
    assert(row.getLong(row.fieldIndex("p50_lo")) ==
      HistogramSketch.percentileLo(counts, 1L, 2L))
    assert(row.getLong(row.fieldIndex("p95_lo")) ==
      HistogramSketch.percentileLo(counts, 19L, 20L))
    assert(row.getLong(row.fieldIndex("p99_lo")) ==
      HistogramSketch.percentileLo(counts, 99L, 100L))
    // the estimate brackets the exact percentile from below, within a bin
    val exact = prices.orderBy(col("o_totalprice"))
      .collect().map(_.getDouble(0))
    val p50exact = exact(math.ceil(0.5 * exact.length).toInt - 1)
    val p50lo = row.getLong(row.fieldIndex("p50_lo"))
    assert(p50lo <= p50exact && p50exact < p50lo + HistogramSketch.binWidth)
  }

  test("v14: truncated-recall audit is bounded and self-consistent") {
    val r = q("v14_truncated_recall")
    assert(r.count() == 10)
    assert(r.filter(col("recall_ct") < 0 || col("recall_ct") > 5)
      .count() == 0)
    assert(r.filter(abs(col("recall") -
      col("recall_ct").cast("double") / 5.0) > 1e-9).count() == 0)
  }

  test("v15: label precision bounded and consistent with match sums") {
    val r = q("v15_label_precision")
    assert(r.count() > 0)
    assert(r.filter(col("match_sum") > col("q_ct") * 5L ||
      col("match_sum") < 0).count() == 0)
    // mean_precision is rounded to 6 dp → tolerance is half an ulp of
    // that rounding, not 1e-9
    assert(r.filter(abs(col("mean_precision") -
      col("match_sum").cast("double") / (col("q_ct") * 5L)) > 5e-7)
      .count() == 0)
    // all 50 query vectors are accounted for across labels
    val qTot = r.agg(sum(col("q_ct"))).head.getLong(0)
    val expect = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") < 50).count()
    assert(qTot == expect)
  }

  test("v16: hard negatives are cross-label and inside the top-10") {
    val r = q("v16_hard_negatives")
    assert(r.count() > 0)
    assert(r.filter(col("q_label") === col("neg_label")).count() == 0)
    assert(r.filter(col("neg_rank") < 1 || col("neg_rank") > 10)
      .count() == 0)
    assert(r.groupBy("q_id").count().filter(col("count") > 1)
      .count() == 0) // one hardest negative per query
  }

  test("v18: probe-recall curve is monotone in nprobe per query") {
    val ops = graft.operators.VectorOps
    val r = q("v18_probe_recall")
    assert(r.count() == 10L * ops.ivfProbeSweepMax) // queries x probes
    assert(r.filter(col("recall_ct") < 0 || col("recall_ct") > 5)
      .count() == 0)
    // searching MORE cells can only add candidates — recall is
    // non-decreasing in nprobe for every query
    val byQ = r.orderBy("q_id", "nprobe").collect()
      .groupBy(_.getLong(0)).values
    byQ.foreach { rows =>
      val cts = rows.sortBy(_.getLong(1))
        .map(x => x.getLong(x.fieldIndex("recall_ct")))
      assert(cts.sliding(2).forall(p => p(0) <= p(1)),
        s"recall not monotone: ${cts.toSeq}")
    }
    // the SHIPPED setting (v3's ivfNprobe — one shared constant) sits
    // inside the sweep, and the curve's aggregate recall AT that
    // setting meets the serving contract OperatorSpec asserts for v3:
    // retuning nprobe from this curve moves both together
    assert(ops.ivfNprobe <= ops.ivfProbeSweepMax)
    val atShipped = r.filter(col("nprobe") === ops.ivfNprobe)
      .agg(sum(col("recall_ct"))).head.getLong(0)
    assert(atShipped >= 10, s"recall@5 at shipped nprobe: $atShipped/50")
  }

  test("v21: IVFADC ranks dense, cosines bounded, recall holds") {
    val r = q("v21_ivfpq_topk")
    assert(r.count() == 50) // 10 queries x exact top-5
    val perQ = r.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"))
    assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0,
      "ranks must be dense 1..5 per query")
    assert(r.filter(col("cos") < -1.0 || col("cos") > 1.0).count() == 0)
    // the ADC shortlist is 30-deep inside a ~50-member cell, so the PQ
    // approximation genuinely selects; it should still retain most of
    // the exact in-cell top-5 (v3 probes by centroid cosine, v21 by
    // residual L2 — cell skew accounts for a small gap) and the same
    // recall class vs brute force that v3's own contract asserts
    val v3 = q("v3_ann_ivf_topk")
      .select(col("q_id").as("vq"), col("n_id").as("vn"))
    val vsIvf = r.join(v3,
      col("q_id") === col("vq") && col("n_id") === col("vn")).count()
    assert(vsIvf >= 30, s"IVFADC vs in-cell exact: $vsIvf/50")
    val brute = q("v1_ann_brute_topk")
      .select(col("q_id").as("bq"), col("n_id").as("bn"))
    val vsBrute = r.join(brute,
      col("q_id") === col("bq") && col("n_id") === col("bn")).count()
    assert(vsBrute >= 8, s"IVFADC recall@5 vs brute: $vsBrute/50")
  }

  test("v24: quant ladder covers the corpus; more bytes, less error") {
    val r = q("v24_quant_error").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("sq8", "pq", "ivfpq"))
    val nVecs = Tables(spark, sf, "embeddings").count()
    r.values.foreach { row =>
      assert(row.getLong(row.fieldIndex("n_vecs")) == nVecs)
      val mse = row.getDouble(row.fieldIndex("mse"))
      val maxE = row.getDouble(row.fieldIndex("max_err"))
      val cos = row.getDouble(row.fieldIndex("mean_cos"))
      assert(mse >= 0 && maxE >= mse, s"max must bound the mean: $row")
      assert(cos > 0 && cos <= 1.0 + 1e-9, s"cosine out of range: $row")
    }
    // 64 bytes/vec (sq8) must reconstruct better than 8 bytes/vec of
    // either code layout. Between the two 8-byte layouts the ladder
    // reports the truthful (and instructive) answer for THIS corpus:
    // synthetic embeddings have no cluster structure, so residuals
    // (emb − an arbitrary centroid) carry MORE variance than the raw
    // vectors and ivfpq reconstructs WORSE than plain pq — exactly the
    // signal v24 exists to surface before an operator trusts the
    // clustered-data intuition (on real corpora residual coding wins).
    def mse(m: String) = r(m).getDouble(r(m).fieldIndex("mse"))
    assert(mse("sq8") < mse("pq") && mse("sq8") < mse("ivfpq"))
  }

  test("v22: index health covers every vector; errors and utilization bounded") {
    val r = q("v22_index_health")
    assert(r.agg(sum(col("member_ct"))).head.getLong(0) ==
      Tables(spark, sf, "embeddings").count(),
      "health report must account for every indexed vector")
    assert(r.filter(col("mean_recon_err") < 0 ||
      col("max_recon_err") < col("mean_recon_err") * 0.999).count() == 0,
      "reconstruction errors must be non-negative with max >= mean")
    val cbSize = graft.operators.VectorOps.pqCodebookSize
    assert(r.filter(col("codes_used_s0") < 1 ||
      col("codes_used_s0") > cbSize).count() == 0)
    // the untrained stand-in codebook must still quantize: SOME spread
    // of codewords is in use in at least one cell
    assert(r.agg(max(col("codes_used_s0"))).head.getLong(0) > 1)
  }

  test("v23: filter pool curve is dense, monotone, and selectivity bites") {
    val ops = graft.operators.VectorOps
    val r = q("v23_filter_pool_curve")
    assert(r.count() == 10L * ops.filterPools.size) // dense spine
    assert(r.filter(col("kept_ct") < 0 ||
      col("kept_ct") > col("pool")).count() == 0)
    // a deeper pool can only retain more predicate matches
    val byQ = r.orderBy("q_id", "pool").collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val cts = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(cts.sliding(2).forall(p => p(0) <= p(1)),
        s"kept_ct not monotone in pool: ${cts.toSeq}")
    }
    // recovered ⇔ kept_ct >= 5, replayed from the row's own columns
    assert(r.filter(col("recovered") =!= (col("kept_ct") >= 5L))
      .count() == 0)
    // the predicate is ~1/10 selective, so the shallow pool must LOSE
    // candidates somewhere — if every query kept its full filtered
    // top-5 at pool=10 the audit would be measuring nothing
    val shallow = r.filter(col("pool") === ops.filterPools.min)
    assert(shallow.filter(col("kept_ct") < 5).count() > 0,
      "pool=10 recovered everything — selectivity fixture degenerate")
  }

  test("v17: DB index covers every vector, ratios positive") {
    val r = q("v17_davies_bouldin")
    assert(r.count() > 1)
    assert(r.agg(sum(col("member_ct"))).head.getLong(0) ==
      Tables(spark, sf, "embeddings").count())
    assert(r.filter(col("scatter") < 0).count() == 0)
    assert(r.filter(col("worst_ratio") <= 0).count() == 0)
  }

  test("v12: power iteration output is normalized and deterministic") {
    val v = q("v12_pca_power")
    assert(v.count() == 64)
    val mx = v.agg(max(abs(col("loading")))).head.getDouble(0)
    assert(math.abs(mx - 1.0) < 1e-9, s"max |loading| was $mx")
    // bit-identical across two independent evaluations (the DECIMAL
    // quantization makes the cross-row sums partition-order free)
    val a = v.orderBy("dim").collect().map(_.getDouble(1)).toSeq
    val b = q("v12_pca_power").orderBy("dim").collect()
      .map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("v19: dense two-stage audit, rank/recall accounting, recall floor") {
    val ops = graft.operators.VectorOps
    val r = q("v19_two_stage_rerank")
    assert(r.count() == 10)
    assert(r.filter(col("final_ct") < 0 || col("final_ct") > 5).count() == 0)
    assert(r.filter(col("recall_ct") > col("final_ct")).count() == 0)
    assert(r.filter(col("recall") =!=
      round(col("recall_ct").cast("double") / 5.0, 6)).count() == 0)
    // the shortlist is deep enough that exact re-ranking recovers real
    // recall (same floor the v3/v18 serving contract states)
    val total = r.agg(sum(col("recall_ct"))).head.getLong(0)
    assert(total >= 10, s"two-stage recall@5: $total/50")
    // probing 2 cells with a 20-deep shortlist must not do WORSE than
    // the v18 curve at nprobe=1 in aggregate (strictly more candidates
    // reach the exact re-ranker than v3's single-cell top-5)
    val v18 = q("v18_probe_recall").filter(col("nprobe") === 1)
      .agg(sum(col("recall_ct"))).head.getLong(0)
    assert(total >= v18, s"two-stage $total < v18@p1 $v18")
  }

  test("v20: MMR trajectory is a valid greedy selection over the pool") {
    val r = q("v20_mmr_diversify")
    assert(r.count() == 50) // 10 queries x 5 steps
    // exactly one pick per (query, step); no document picked twice
    assert(r.groupBy(col("q_id"), col("mmr_step")).count()
      .filter(col("count") =!= 1).count() == 0)
    assert(r.groupBy(col("q_id"), col("n_id")).count()
      .filter(col("count") =!= 1).count() == 0)
    // step 1 is pure relevance: it must equal the brute-force top-1
    val top1 = q("v1_ann_brute_topk").filter(col("rk") === 1)
      .select(col("q_id").as("bq"), col("n_id").as("bn"))
    assert(r.filter(col("mmr_step") === 1)
      .join(top1, col("q_id") === col("bq"))
      .filter(col("n_id") =!= col("bn")).count() == 0)
    // diversification bites on random embeddings: at least one query's
    // selection departs from the pure-relevance top-5
    val top5 = q("v1_ann_brute_topk")
      .select(col("q_id").as("bq"), col("n_id").as("bn"))
    val overlap = r.join(top5,
      col("q_id") === col("bq") && col("n_id") === col("bn")).count()
    assert(overlap < 50, s"MMR == brute top-5 everywhere ($overlap/50)")
  }
}
