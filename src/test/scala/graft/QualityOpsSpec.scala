package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.operators.{QualityOps, TextOps}

/** Invariants of the corpus-quality operators beyond the oracle hash:
  * redaction is complete (no pattern survives), repetition signals stay
  * in their ranges, and int8 ANN keeps real recall against brute force. */
class QualityOpsSpec extends SparkSuite {

  test("p15: redaction removes every planted match") {
    val d = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        QualityOps.redact(concat(col("text"),
          lit(" u1@a.io +1-555-77 192.168.1.1"))).as("red"))
    Seq(QualityOps.emailPat, QualityOps.phonePat, QualityOps.ipPat)
      .foreach { p =>
        assert(d.filter(col("red").rlike(p)).count() == 0,
          s"pattern survived redaction: $p")
      }
    // counts are all positive on the planted fixture
    val agg = q("p15_pii_redact").agg(sum(col("email_ct")),
      sum(col("phone_ct")), sum(col("ip_ct")), sum(col("removed_chars")))
      .head
    (0 until 4).foreach(i => assert(agg.getLong(i) > 0))
  }

  test("t10: repetition signals stay in range") {
    val r = q("t10_repetition_signals")
    assert(r.count() > 0)
    assert(r.filter(col("dup_frac") < 0 || col("dup_frac") >= 1)
      .count() == 0)
    assert(r.filter(col("top_bigram_ct") > col("n_tokens") - 1)
      .count() == 0)
    assert(r.filter(col("n_distinct") > col("n_tokens")).count() == 0)
  }

  test("v7: int8 quantized ANN keeps >= 3/5 exact neighbors per query") {
    val r = q("v7_ann_int8_topk")
    assert(r.count() == 10)
    assert(r.filter(!col("int8_ok")).count() == 0)
  }

  test("c8: funnel gates are monotone per source") {
    val r = q("c8_quality_funnel")
    assert(r.count() > 0)
    assert(r.filter(col("len_ok_ct") > col("total_ct") ||
      col("rep_ok_ct") > col("len_ok_ct") ||
      col("clean_ct") > col("rep_ok_ct")).count() == 0)
    // the planted PII fixture actually cuts documents at the last gate
    val cut = r.agg(sum(col("rep_ok_ct") - col("clean_ct"))).head.getLong(0)
    assert(cut > 0)
  }

  test("v8: PQ shortlist + exact re-rank keeps >= 3/5 per query") {
    val r = q("v8_ann_pq_topk")
    assert(r.count() == 10)
    assert(r.filter(!col("pq_ok")).count() == 0)
  }

  test("c9: packing conserves tokens and stays within fill bounds") {
    val r = q("c9_sequence_packing")
    assert(r.count() > 0)
    // every sequence is at most full; the layout wastes less than one
    // sequence per source (concat-and-chunk leaves only the tail slack)
    assert(r.filter(col("fill_rate") <= 0 || col("fill_rate") > 1)
      .count() == 0)
    assert(r.filter(col("token_sum") >
      col("n_sequences") * 2048L).count() == 0)
    assert(r.filter(col("token_sum") <=
      (col("n_sequences") - 1) * 2048L).count() == 0)
    assert(r.filter(col("boundary_docs") >= col("doc_ct")).count() == 0)
  }

  test("m4: resize never grows a payload and hits the budget") {
    val r = q("m4_resize_stats")
    assert(r.count() > 0)
    assert(r.filter(col("out_bytes") > col("in_bytes")).count() == 0)
    assert(r.filter(col("out_bytes") > col("media_ct") * 256L)
      .count() == 0)
  }

  test("m3: frame dedup finds exactly the planted pairs") {
    val r = q("m3_frame_near_dup")
    // re-uploads share all 4 frames; every kept pair involves a planted id
    assert(r.filter(col("shared_ct") === 4).count() > 0)
    assert(r.filter(col("b_id") < 1000000000L).count() == 0,
      "a pair of two ORIGINAL docs survived the threshold — accidental " +
        "frame collision, fixture no longer analytic")
  }

  test("v9: partition is total and one Lloyd step does not increase " +
      "distortion") {
    import graft.operators.VectorOps
    val r = q("v9_kmeans_assign")
    val emCt = Tables(spark, sf, "embeddings").count()
    assert(r.agg(sum(col("member_ct"))).head.getLong(0) == emCt)
    // Lloyd monotonicity: distortion after recompute+reassign <= the
    // seed-centroid assignment distortion (epsilon for the 6-dp quantize)
    val em = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cent0 = em.filter(col("vec_id") % 50 === 0)
      .select(col("emb").as("c_emb"))
    val d0 = em.join(broadcast(cent0))
      .select(col("vec_id"), VectorOps.sqDist(col("emb"), col("c_emb")).as("d2"))
      .groupBy(col("vec_id")).agg(min(col("d2")).as("d2"))
      .agg(sum(col("d2"))).head.getDouble(0)
    val d1 = r.agg(sum(col("sum_sqdist"))).head.getDouble(0)
    assert(d1 <= d0 + 1e-3, s"Lloyd step increased distortion: $d1 > $d0")
  }

  test("v10: outlier scores are >= 1 of their cluster mean floor and " +
      "sorted") {
    val r = q("v10_embed_outliers").collect()
    assert(r.length == 20)
    // top-20 by score: descending, tie-broken by vec_id
    val scores = r.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the max of d2/mean within a cluster is always >= 1
    assert(scores.head >= 1.0)
  }

  test("t12: posting stats are internally consistent") {
    val r = q("t12_inverted_index")
    // vocab at sf0.001 is below the LIMIT 50 — assert the cap, not equality
    val ct = r.count()
    assert(ct > 0 && ct <= 50)
    val docCt = Tables(spark, sf, "documents").count()
    assert(r.filter(col("df") > docCt).count() == 0)
    assert(r.filter(col("tf_sum") < col("df")).count() == 0)
    assert(r.filter(col("min_doc") > col("max_doc")).count() == 0)
    // checksum bounds: df * min_doc <= posting_sum <= df * max_doc
    assert(r.filter(col("posting_sum") < col("df") * col("min_doc") ||
      col("posting_sum") > col("df") * col("max_doc")).count() == 0)
  }

  test("t13: entropy bounded by ln(distinct), fractions in range") {
    val r = q("t13_text_entropy")
    assert(r.count() > 0)
    assert(r.filter(col("token_entropy") < -1e-6).count() == 0)
    assert(r.filter(col("token_entropy") >
      log(col("distinct_ct")) + 1e-6).count() == 0)
    assert(r.filter(col("alpha_frac") < 0 || col("alpha_frac") > 1)
      .count() == 0)
  }

  test("c10: weighted sample is exact-size and weight-biased") {
    val r = q("c10_weighted_sample")
    assert(r.count() == 200)
    assert(r.select(col("doc_id")).distinct().count() == 200)
    // Efraimidis-Spirakis inclusion is weight-proportional: the sampled
    // mean token count must exceed the corpus mean
    val sampleMean = r.agg(avg(col("n_tokens"))).head.getDouble(0)
    val corpusMean = Tables(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(avg(col("n"))).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("x5: bloom prefilter is sound (no false negatives) and prunes") {
    val docs = Tables(spark, sf, "documents")
    val newTotal = docs.filter(col("source") === "src0").count()
    val cand = graft.operators.ScalePatterns
      .bloomCandidates(spark, sf).select("doc_id")
    // sound: every exactly-matched new doc survives the bloom
    val exact = q("x5_bloom_prefilter").select("doc_id")
    assert(exact.exceptAll(cand).count() == 0,
      "bloom dropped a true match (false negative)")
    // useful: the sketch prunes at least part of the new batch unless
    // (tiny sf) every new doc genuinely matches the store
    val candCt = cand.count()
    val exactCt = exact.count()
    assert(candCt >= exactCt && candCt <= newTotal)
    if (exactCt < newTotal)
      assert(candCt < newTotal, "bloom pruned nothing")
  }

  test("v11: semdedup ledger is conserved and pruning is id-greedy") {
    val r = q("v11_semdedup")
    assert(r.count() > 0)
    assert(r.filter(col("pruned_ct") + col("kept_ct") =!= col("member_ct"))
      .count() == 0)
    assert(r.filter(col("kept_ct") < 1).count() == 0,
      "every cluster keeps at least its lowest-id member")
    val members = r.agg(sum(col("member_ct"))).head.getLong(0)
    assert(members == Tables(spark, sf, "embeddings").count())
    // the keep rule never prunes a cluster's lowest id (v9 publishes it)
    val mins = q("v9_kmeans_assign").select(col("cluster_id"),
      col("min_member"))
    assert(r.join(mins, "cluster_id")
      .filter(col("first_pruned").isNotNull &&
        col("first_pruned") <= col("min_member")).count() == 0)
  }

  test("t14: dup-span fractions in range and consistent") {
    val r = q("t14_dup_ngram_spans")
    assert(r.count() > 0)
    assert(r.filter(col("dup_gram_ct") > col("gram_ct")).count() == 0)
    assert(r.filter(col("dup_frac") < 0 || col("dup_frac") > 1)
      .count() == 0)
    // gram_ct per doc = tokens - 4 (docs all have >= 5 tokens)
    val bad = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - 4).cast("long").as("expect"))
      .join(r, "doc_id")
      .filter(col("gram_ct") =!= col("expect"))
    assert(bad.count() == 0)
  }

  test("t19: merged extents are sane and agree with t14's flags") {
    val r = q("t19_dup_span_extents")
    assert(r.count() > 0)
    // extents cover at least one 5-token span and never exceed the doc
    assert(r.filter(col("dup_tokens") < 5 ||
      col("dup_tokens") > col("n_tokens")).count() == 0)
    assert(r.filter(col("longest_extent") * col("n_extents") <
      col("dup_tokens")).count() == 0) // max * count bounds the sum
    assert(r.filter(col("cut_frac") <= 0 || col("cut_frac") > 1)
      .count() == 0)
    // every doc with a duplicated gram in t14 has an extent here, and
    // vice versa — the two views see the same duplicated-span set
    val t14docs = q("t14_dup_ngram_spans")
      .filter(col("dup_gram_ct") > 0).select("doc_id")
    assert(t14docs.exceptAll(r.select("doc_id")).count() == 0)
    assert(r.select("doc_id").exceptAll(t14docs).count() == 0)
  }

  test("t20: readability counts are consistent, grades cover all docs") {
    val r = q("t20_readability")
    assert(r.count() == Tables(spark, sf, "documents").count())
    // every word carries at least one vowel-run? no — but syllables
    // can never exceed the character count, and words >= 1
    assert(r.filter(col("words") < 1 || col("sentences") < 1)
      .count() == 0)
    val j = r.join(Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")), "doc_id")
    assert(j.filter(col("syllables") > col("n_chars")).count() == 0)
  }

  test("c11: temperature mixing up-weights small sources") {
    val r = q("c11_temperature_mix")
    assert(r.count() > 0)
    assert(r.filter(col("rate") <= 0 || col("rate") > 1).count() == 0)
    assert(r.filter(col("kept_tokens") > col("src_tokens")).count() == 0)
    // alpha = 0.5: among uncapped sources, rate strictly decreases as
    // source size grows
    val rows = r.filter(col("rate") < 1.0)
      .select(col("src_tokens").cast("long"), col("rate"))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((s1, r1), (s2, r2)) =>
        if (s1 < s2) assert(r1 >= r2,
          s"rate must not grow with size: ($s1,$r1) vs ($s2,$r2)")
      case _ =>
    }
  }

  test("t15: dsir ranks target-domain docs above base rate") {
    val r = q("t15_dsir_scores")
    assert(r.count() == 50)
    // sorted by score desc (with doc_id tiebreak)
    val scores = r.select(col("dsir_score")).collect().map(_.getDouble(0))
    assert(scores.sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
    // target-domain docs (the distribution defining p_target) must be
    // over-represented in the top-50 vs their corpus share
    val topTgt = r.filter(pmod(col("doc_id"), lit(37L)) === 0).count()
    val d = Tables(spark, sf, "documents")
    val baseShare = d.filter(pmod(col("doc_id"), lit(37L)) === 0).count()
      .toDouble / d.count()
    assert(topTgt.toDouble / 50 > baseShare,
      s"target share in top-50 ($topTgt/50) not above base $baseShare")
  }

  test("t18: bigram-LM perplexity favors the training slice") {
    val r = q("t18_bigram_perplexity")
    assert(r.count() == 50)
    // ascending by avg_nll (low = target-like), all scores positive
    val scores = r.select(col("avg_nll")).collect().map(_.getDouble(0))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall {
      case Array(a, b) => a <= b
      case _ => true
    })
    // docs the LM was trained on must be over-represented in the
    // most-target-like 50 vs their corpus share
    val topTgt = r.filter(pmod(col("doc_id"), lit(37L)) === 0).count()
    val d = Tables(spark, sf, "documents")
    val baseShare = d.filter(pmod(col("doc_id"), lit(37L)) === 0).count()
      .toDouble / d.count()
    assert(topTgt.toDouble / 50 > baseShare,
      s"target share in top-50 ($topTgt/50) not above base $baseShare")
  }

  test("t25: cross-entropy difference separates the target slice") {
    val r = q("t25_cross_entropy_diff")
    val d = Tables(spark, sf, "documents")
    // every doc with >=2 tokens is scored (selection runs on the pool)
    assert(r.count() > 0 && r.count() <= d.count())
    assert(r.filter(col("n_bigrams") <= 0).count() == 0)
    // THE Moore-Lewis property: in-domain docs score lower (more
    // negative Delta = target-like) than the general pool ON AVERAGE —
    // the general-LM subtraction cancels generic fluency, so this
    // separation is what the method exists to produce
    val tgtMean = r.filter(pmod(col("doc_id"), lit(37L)) === 0)
      .agg(avg(col("ce_diff"))).head.getDouble(0)
    val genMean = r.filter(pmod(col("doc_id"), lit(37L)) =!= 0)
      .agg(avg(col("ce_diff"))).head.getDouble(0)
    assert(tgtMean < genMean,
      s"target mean $tgtMean not below general mean $genMean")
  }

  test("t16: overlap pairs are ordered, thresholded, and agree with d3") {
    val r = q("t16_winnow_overlap_pairs")
    assert(r.count() > 0)
    assert(r.filter(col("a_id") >= col("b_id")).count() == 0)
    assert(r.filter(col("shared_fp") < 3).count() == 0)
    // whole-doc near-dups (d3) share local fingerprints too: the two
    // pair sets must intersect
    val both = r.select(col("a_id"), col("b_id"))
      .join(q("d3_near_dup_pairs").select(col("a_id"), col("b_id")),
        Seq("a_id", "b_id"))
    assert(both.count() > 0, "no overlap between t16 and d3 pair sets")
  }

  test("p16: canonical urls carry no tracking/fragment/case noise") {
    val r = q("p16_url_canonicalize")
    assert(r.count() > 0)
    assert(r.filter(col("canon_url").rlike("utm_|#|//www\\.|[A-Z]"))
      .count() == 0)
    val docCt = Tables(spark, sf, "documents").count()
    assert(r.agg(sum(col("dup_ct"))).head.getLong(0) == docCt)
    // the fixture generates real collisions: some canonical target has
    // multiple raw variants
    assert(r.filter(col("variant_ct") >= 2).count() > 0)
  }

  test("t21: gram accounting exact, gate replays from its own columns, t10 agreement") {
    val r = q("t21_repetition_rules")
    assert(r.count() == Tables(spark, sf, "documents").count())
    // gram totals are determined by the token count
    assert(r.filter(col("gram2_ct") =!=
      greatest(col("n_tokens") - 1, lit(0L))).count() == 0)
    assert(r.filter(col("gram3_ct") =!=
      greatest(col("n_tokens") - 2, lit(0L))).count() == 0)
    // dup counts bounded, top token sane
    assert(r.filter(col("dup2_ct") < 0 || col("dup2_ct") > col("gram2_ct"))
      .count() == 0)
    assert(r.filter(col("dup3_ct") < 0 || col("dup3_ct") > col("gram3_ct"))
      .count() == 0)
    assert(r.filter(col("top_tok_ct") < 1 ||
      col("top_tok_ct") > col("n_tokens")).count() == 0)
    // the flag is a pure function of the reported columns
    val want = col("top_tok_ct") * 5 > col("n_tokens") ||
      col("dup2_ct") * 5 > col("gram2_ct") ||
      col("dup3_ct") * 10 > col("gram3_ct") * 3
    assert(r.filter(col("flagged") =!= want).count() == 0)
    // t10's top bigram appearing k times forces >= k-1 within-doc
    // duplicate 2-grams (t10 lowercases; duplicates only merge further)
    val t10 = q("t10_repetition_signals")
      .select(col("doc_id").as("d10"), col("top_bigram_ct"))
    assert(r.join(t10, col("doc_id") === col("d10"))
      .filter(col("top_bigram_ct") >= 2 &&
        col("dup2_ct") < col("top_bigram_ct") - 1).count() == 0)
  }

  test("t22: OOV accounting closes against the raw token stream") {
    val r = q("t22_vocab_coverage")
    val srcs = Tables(spark, sf, "documents")
      .select(col("source")).distinct().count()
    assert(r.count() == srcs)
    // token mass conserved vs an independent recount
    val want = Tables(spark, sf, "documents")
      .select(col("source"),
        size(TextOps.tokenize(col("text"))).cast(LongType).as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("want_ct"))
      .withColumnRenamed("source", "s2")
    assert(r.join(want, col("source") === col("s2"))
      .filter(col("token_ct") =!= col("want_ct")).count() == 0)
    assert(r.filter(col("oov_ct") < 0 ||
      col("oov_ct") > col("token_ct")).count() == 0)
    assert(r.filter(col("oov_distinct_ct") > col("oov_ct")).count() == 0)
    // rate is exactly the reported ratio
    assert(r.filter(col("oov_rate") =!=
      round(col("oov_ct").cast("double") / col("token_ct").cast("double"),
        6)).count() == 0)
    // a 500-token vocab on a zipfy corpus must cover SOME mass:
    // not every token is OOV in every source
    assert(r.filter(col("oov_ct") === col("token_ct")).count() == 0)
  }

  test("p19: k-anonymity classes reconcile with a direct recompute") {
    val r = q("p19_k_anonymity").collect()
    val idx = r.head.fieldIndex _
    val types = Tables(spark, sf, "events")
      .select(col("event_type")).distinct().count()
    assert(r.length == types, "one row per event_type")
    r.foreach { row =>
      assert(row.getLong(idx("risky_class_ct")) <=
        row.getLong(idx("class_ct")))
      assert(row.getLong(idx("min_class_users")) >= 1)
      // flag is exactly the min-class rule
      assert(row.getBoolean(idx("k_anonymous")) ==
        (row.getLong(idx("min_class_users")) >= QualityOps.kAnon))
      // a risky class binds at least one record each
      assert(row.getLong(idx("risky_rec_ct")) >=
        row.getLong(idx("risky_class_ct")))
    }
    // brute recompute for one event_type: class count and min size
    val first = r.minBy(_.getString(0))
    val et = first.getString(0)
    val cls = Tables(spark, sf, "events")
      .filter(col("event_type") === et)
      .select(graft.functions.Fns.divFloor(
          graft.functions.Fns.nsToUs(col("ts")),
          7L * 86400L * 1000000L).as("wk"),
        floor(col("value") / lit(10.0)).cast("long").as("vb"),
        col("user_id"))
      .groupBy(col("wk"), col("vb"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect()
    assert(first.getLong(idx("class_ct")) == cls.length)
    assert(first.getLong(idx("min_class_users")) ==
      cls.map(_.getLong(2)).min)
  }

  test("t27: Zipf fit is negative-sloped and matches a brute OLS replay") {
    val r = q("t27_zipf_slope").collect()
    val idx = r.head.fieldIndex _
    val sources = Tables(spark, sf, "documents")
      .select(col("source")).distinct().count()
    assert(r.length == sources)
    r.foreach { row =>
      assert(row.getLong(idx("n_top")) >= 10 &&
        row.getLong(idx("n_top")) <= 100)
      // frequencies fall with rank, so the fitted slope must be < 0
      assert(row.getDouble(idx("zipf_slope")) < 0, s"non-Zipf: $row")
      assert(row.getDouble(idx("zipf_intercept")) > 0)
    }
    // brute OLS replay for one source from the raw counts
    val first = r.minBy(_.getString(0))
    val cts = Tables(spark, sf, "documents")
      .filter(col("source") === first.getString(0))
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("t")).limit(100)
      .collect().map(_.getLong(1))
    val xs = cts.indices.map(i => math.log(i + 1.0))
    val ys = cts.map(c => math.log(c.toDouble))
    val n = cts.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(first.getDouble(idx("zipf_slope")) - slope) < 1e-4,
      s"engine ${first.getDouble(idx("zipf_slope"))} vs brute $slope")
  }

  test("t26: edge-template accounting per (source, kind) is consistent") {
    val r = q("t26_template_spans").collect()
    val idx = r.head.fieldIndex _
    val sources = Tables(spark, sf, "documents")
      .select(col("source")).distinct().count()
    // dense report: one prefix + one suffix row per source
    assert(r.length == 2 * sources, s"${r.length} rows vs $sources sources")
    // participating docs per source agree between the two edge kinds
    r.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.map(_.getLong(idx("doc_ct"))).distinct.length == 1,
        s"$src: prefix/suffix doc_ct disagree")
    }
    r.foreach { row =>
      val (docs, grams) =
        (row.getLong(idx("doc_ct")), row.getLong(idx("distinct_grams")))
      val (tpl, tplDocs) =
        (row.getLong(idx("template_ct")), row.getLong(idx("templated_docs")))
      assert(grams <= docs && tpl <= grams && tplDocs <= docs)
      // a template binds >= 2 docs; zero templates -> NULL top fields
      if (tpl == 0) {
        assert(tplDocs == 0 && row.isNullAt(idx("top_ct")) &&
          row.isNullAt(idx("top_gram")))
      } else {
        assert(tplDocs >= 2 * tpl)
        assert(row.getLong(idx("top_ct")) >= 2)
        assert(row.getString(idx("top_gram")).split(" ").length == 5)
      }
    }
  }

  test("t24: fertility cells conserved, sums positive, ratios replayed") {
    val r = q("t24_tokenizer_fertility")
    val cells = Tables(spark, sf, "documents")
      .select(col("source"), col("lang")).distinct().count()
    assert(r.count() == cells)
    assert(r.agg(sum(col("doc_ct"))).head.getLong(0) ==
      Tables(spark, sf, "documents").count())
    assert(r.filter(col("bpe_sum") <= 0 || col("ws_sum") <= 0 ||
      col("char_sum") <= 0).count() == 0)
    // the reported ratios are exactly the one-shot divisions
    assert(r.filter(col("fertility") =!=
      round(col("bpe_sum").cast("double") / col("ws_sum"), 6))
      .count() == 0)
    assert(r.filter(col("chars_per_token") =!=
      round(col("char_sum").cast("double") / col("bpe_sum"), 6))
      .count() == 0)
    // BPE-ish runs are disjoint non-empty substrings of the text, so
    // the corpus can never hold more runs than characters (structural
    // at ANY testdata shape; no lower bound on fertility — a word of
    // punctuation or non-ASCII has zero [a-z0-9] runs)
    assert(r.filter(col("chars_per_token") < 1.0).count() == 0)
  }

  test("t23: code gate partitions the corpus and densities are ratios") {
    val r = q("t23_code_fraction")
    // every (source, lang) cell present exactly once; doc mass conserved
    val cells = Tables(spark, sf, "documents")
      .select(col("source"), col("lang")).distinct().count()
    assert(r.count() == cells)
    val total = r.agg(sum(col("doc_ct"))).head.getLong(0)
    assert(total == Tables(spark, sf, "documents").count())
    assert(r.filter(col("code_ct") < 0 ||
      col("code_ct") > col("doc_ct")).count() == 0)
    assert(r.filter(col("code_frac") =!=
      round(col("code_ct").cast("double") / col("doc_ct"), 6))
      .count() == 0)
    // symbol density is a per-char ratio: strictly inside [0, 1]
    assert(r.filter(col("sym_density") < 0 ||
      col("sym_density") > 1).count() == 0)
    // prose corpus sanity: the whitespace-word testdata sits near zero
    // symbol density, so the gate must not fire on everything
    assert(r.filter(col("code_frac") === 1.0).count() < cells)
  }
}
