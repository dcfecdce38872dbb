package graft

import org.apache.spark.sql.functions._

/** Per-operator invariants on tiny frames (SURVEY.md §5 point 1) — the
  * DuckDB oracle (driver t2 + tools/verify_local.py) covers value
  * equality; these specs pin the semantic properties that survive data
  * changes. */
class OperatorSpec extends SparkSuite {

  test("entry flagship returns rows with expected shape") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet ==
      Set("cur_date", "r_name", "n_name", "order_ct", "order_amount"))
    assert(df.count() > 0)
  }

  test("every query has a unique name and runs non-empty or empty-by-design") {
    // every registered query, from the same registry the driver uses;
    // a name collision across modules would silently drop a query in
    // the flatMap.toMap, so compare against the per-module sum
    val perModule = SparkEntry.modules.map(_.queries.size).sum
    assert(SparkEntry.queries.size == perModule,
      "duplicate query name across modules")
    val names = SparkEntry.queries.keys.toSeq
    // empty-at-tiny-scale by design: no exact dups / 8-day gaps /
    // orderless customers / no sub-threshold simhash pairs at sf0.001
    val mayBeEmpty = Set("d1_exact_dup_groups", "a8_back_visitors",
      "j7_anti_customers", "d6_simhash_near_pairs")
    names.foreach { n =>
      val c = q(n).count()
      assert(c >= 0 && (c > 0 || mayBeEmpty(n)), s"$n unexpectedly empty")
    }
  }

  test("oracle keys are a subset of query keys") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracles: ${ok -- qk}")
    assert(qk == ok, s"queries without oracle: ${qk -- ok}")
  }

  test("a7 dedup keeps exactly one row per user") {
    val df = q("a7_dedup_last")
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("a8 daily uv is bounded by total users and total events") {
    val users = Tables(spark, sf, "events")
      .select(countDistinct(col("user_id"))).head.getLong(0)
    val uv = q("a8_daily_uv")
    assert(uv.agg(max(col("uu_ct"))).head.getLong(0) <= users)
  }

  test("a9 new+old splits every active user-day exactly once") {
    val e = Tables(spark, sf, "events")
    val userDays = e.select(col("user_id"),
      graft.functions.Fns.curDate(graft.functions.Fns.nsToSec(col("ts"))))
      .distinct().count()
    val split = q("a9_is_new_fix")
      .agg(sum(col("new_uv") + col("old_uv"))).head.getLong(0)
    assert(split == userDays)
  }

  test("j3 interval join only pairs clicks inside [-30min, +5s]") {
    import spark.implicits._
    // synthetic frame: purchase at t=0; clicks at -31min, -30min, 0, +5s, +6s
    val min30 = 1800L * 1000000000L
    val rows = Seq(
      (1L, 0L, "purchase", 100L),
      (1L, -min30 - 60L * 1000000000L, "click", 101L),
      (1L, -min30, "click", 102L),
      (1L, 0L, "click", 103L),
      (1L, 5L * 1000000000L, "click", 104L),
      (1L, 6L * 1000000000L, "click", 105L),
      (2L, 0L, "click", 106L)) // other user — never joined
      .toDF("user_id", "rel_ts", "event_type", "event_id")
      .withColumn("ts", col("rel_ts") + lit(1700000000L * 1000000000L))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("rel_ts")
    val dir = java.nio.file.Files.createTempDirectory("j3").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val res = SparkEntry.queries("j3_interval_join")(spark, dir)
    val pairCt = res.agg(sum(col("pair_ct"))).head.getLong(0)
    assert(pairCt == 3, s"expected clicks at -30min, 0, +5s only, got $pairCt")
  }

  test("d3 near-dup jaccard is within (0.8, 1] and pairs are ordered") {
    val df = q("d3_near_dup_pairs")
    assert(df.filter(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() == 0)
    assert(df.filter(col("a_id") >= col("b_id")).count() == 0)
  }

  test("d10 CDC chunks: token mass conserved, boundary shift-stability") {
    val r = q("d10_cdc_chunks").collect()
    val idx = r.head.fieldIndex _
    // every token of every doc lands in exactly one chunk
    val tokSums = Tables(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).as("tok"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { row =>
      val src = row.getString(0)
      val meanLen = row.getDouble(idx("mean_chunk_len"))
      val chunkCt = row.getLong(idx("chunk_ct"))
      assert(math.abs(meanLen * chunkCt - tokSums(src)) < 0.01 * chunkCt,
        s"$src: chunk token mass does not reconcile")
      assert(row.getLong(idx("distinct_ct")) <= chunkCt)
      assert(row.getLong(idx("dup_chunk_ct")) ==
        chunkCt - row.getLong(idx("distinct_ct")))
    }
    // the CDC property itself: prepending a token to a document leaves
    // every chunk AFTER the first boundary identical (fixed-stride
    // tiling would shift them all)
    import spark.implicits._
    val doc = (1 to 60).map(i => s"tok${i * 7 % 23}x$i").mkString(" ")
    def chunkFps(text: String): Seq[String] = {
      val toks = text.split(" ").toSeq
      val isB = toks.map { t =>
        val h = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(t)
            .substring(0, 8), 16)
        h % 16 == 0
      }
      val bounds = 0 +: isB.zipWithIndex.collect {
        case (true, i) => i + 1 } :+ toks.length
      bounds.distinct.sliding(2).map { case Seq(a, b) =>
        toks.slice(a, b).mkString(" ") }.toSeq
    }
    val base = chunkFps(doc)
    val shifted = chunkFps("prepended " + doc)
    // all chunks after the first boundary survive the shift
    assert(base.tail.toSet.subsetOf(shifted.toSet),
      "CDC chunks after the first boundary must be shift-stable")
  }

  test("d2 LSH candidates superset of d3 verified pairs") {
    val cand = q("d2_lsh_candidates").agg(sum(col("candidate_ct")))
      .head.getLong(0)
    assert(q("d3_near_dup_pairs").count() <= cand)
  }

  test("d4 simhash bands reconstruct the signature") {
    val df = q("d4_simhash")
    val bad = df.filter(
      col("hband0") + col("hband1") * 256 + col("hband2") * 65536 +
        col("hband3") * 16777216 =!= col("simhash")).count()
    assert(bad == 0)
  }

  test("v1 brute-force top-k: 5 ranked neighbors per query, cos in [-1,1]") {
    val df = q("v1_ann_brute_topk")
    assert(df.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
    assert(df.filter(col("cos") > 1.001 || col("cos") < -1.001).count() == 0)
    // rank ordering consistent with score ordering
    assert(df.filter(col("rk") === 1).count() == 10)
  }

  test("v3 IVF recall@5 vs brute force is sane (> 0.2)") {
    val brute = q("v1_ann_brute_topk").select("q_id", "n_id")
    val ivf = q("v3_ann_ivf_topk").select("q_id", "n_id")
    val hits = brute.intersect(ivf).count()
    assert(hits >= 10, s"IVF recall too low: $hits/50") // ≥0.2 recall
  }

  test("multimodal decode stub is deterministic and metadata-only scan prunes payload") {
    val feats = operators.Multimodal.decodeFeatures(spark, sf)
    val a = feats.collect().sortBy(_.doc_id)
    val b = operators.Multimodal.decodeFeatures(spark, sf)
      .collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.feat_dim == 16))
    // metadata query must not read the media column from parquet
    val plan = q("m1_media_meta").queryExecution.executedPlan.toString
    assert(!plan.contains("media,") || !plan.contains("ReadSchema: struct<media"),
      "m1 scan should prune the payload column")
  }

  test("frame sampling fans one media row into n binary frames losslessly-prefixed") {
    val frames = operators.Multimodal.sampleFrames(spark, sf, 4)
    val perDoc = frames.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") =!= 4).count() == 0)
    // frames concatenate back to a prefix of the original payload
    val doc0 = frames.filter(col("doc_id") === 0)
      .orderBy("frame_no").collect()
      .flatMap(_.frame)
    val orig = operators.Multimodal.mediaTable(spark, sf)
      .filter(col("doc_id") === 0).head.getAs[Array[Byte]]("media")
    assert(doc0.sameElements(orig.take(doc0.length)))
  }

  test("m5 strided windows stitch back to the exact original payload") {
    val ops = operators.Multimodal
    // stitching rule: every window but the last contributes its first
    // `hop` bytes; the last contributes fully — exactly how strided
    // inference outputs (e.g. transcripts) are merged downstream
    val chunks = ops.chunkAudio(spark, sf).collect()
      .groupBy(_.doc_id)
    val media = ops.mediaTable(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media"))
      .toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (docId, cs) =>
      val ordered = cs.sortBy(_.chunk_no)
      val orig = media(docId)
      assert(ordered.length ==
        math.max((orig.length + ops.audioHop - 1) / ops.audioHop, 1),
        s"doc $docId: wrong window count")
      val stitched = ordered.init.flatMap(_.chunk.take(ops.audioHop)) ++
        ordered.last.chunk
      assert(stitched.sameElements(orig),
        s"doc $docId: stitched windows != payload")
      // middle windows genuinely overlap their successor
      ordered.dropRight(1).foreach { c =>
        assert(c.chunk.length >= ops.audioHop) }
    }
  }

  test("tokenize/fingerprint normalize as specified") {
    import spark.implicits._
    val df = Seq(("A  b c", 1), ("a b C", 2)).toDF("text", "id")
    val fps = df.select(operators.TextOps.fingerprint(col("text"))).distinct()
    assert(fps.count() == 1, "case+whitespace-insensitive fingerprint")
  }

  test("a23 funnel stages are monotone and sessions partition the events") {
    val r = q("a23_session_funnel").head
    val (sessions, viewed, clicked, purchased) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(sessions > 0)
    assert(sessions >= viewed && viewed >= clicked && clicked >= purchased,
      s"funnel must be monotone: $sessions >= $viewed >= $clicked >= $purchased")
    // strict ordering bites: some views exist, not every session converts
    assert(viewed > 0 && purchased < sessions)
  }

  test("a24 retention: offset-0 is the cohort ceiling, offsets bounded") {
    val r = q("a24_cohort_retention")
    assert(r.count() > 0)
    assert(r.filter(col("week_offset") < 0 || col("week_offset") > 8)
      .count() == 0)
    assert(r.filter(col("active_users") <= 0).count() == 0)
    // the signup event itself makes every cohort member active at
    // offset 0, so no later offset can exceed it
    val base = r.filter(col("week_offset") === 0)
      .select(col("cohort_week").as("cw"), col("active_users").as("base"))
    assert(r.join(base, col("cohort_week") === col("cw"))
      .filter(col("active_users") > col("base")).count() == 0)
  }

  test("x6 compaction plan: bins bounded, greedy rule respected") {
    val r = q("x6_compaction_plan")
    assert(r.count() > 0)
    assert(r.filter(col("n_bins") > col("n_files")).count() == 0)
    assert(r.filter(col("max_bin_bytes") > col("total_bytes"))
      .count() == 0)
    assert(r.filter(col("fill_frac") <= 0).count() == 0)
    // greedy cumulative packing: bins cover the byte range exactly —
    // n_bins is within one of total/target (bins overshoot by at most
    // the one file that crossed the boundary, so the count can only
    // shrink vs the ideal, never grow past it + 1)
    val t = operators.ScalePatterns.compactTarget
    assert(r.filter(col("n_bins") > col("total_bytes") / t + 1)
      .count() == 0)
    // the planner actually coalesces: fewer bins than files somewhere
    assert(r.filter(col("n_bins") < col("n_files")).count() > 0)
  }

  test("a27 conversion latency: ordered percentiles, superset of a23") {
    val r = q("a27_conversion_latency").head
    val n = r.getLong(r.fieldIndex("converted_sessions"))
    val p50 = r.getLong(r.fieldIndex("p50_latency_s"))
    val p95 = r.getLong(r.fieldIndex("p95_latency_s"))
    assert(n > 0 && p50 >= 0 && p50 <= p95)
    // view→purchase (no click required) is a superset of a23's
    // view→click→purchase conversions
    val f = q("a23_session_funnel").head
    assert(n >= f.getLong(f.fieldIndex("purchased_after_click")))
  }

  test("x7 table stats: one catalog row per column, bounds sane") {
    val r = q("x7_table_stats")
    assert(r.count() == 5)
    val n = Tables(spark, sf, "orders").count()
    assert(r.filter(col("row_ct") =!= n).count() == 0)
    assert(r.filter(col("ndv") + col("null_ct") > col("row_ct"))
      .count() == 0)
    assert(r.filter(col("ndv") <= 0).count() == 0)
    // key column is unique
    assert(r.filter(col("column_name") === "o_orderkey")
      .filter(col("ndv") =!= n).count() == 0)
    // the approx-NDV twin honors its within-5% contract on every column
    assert(r.filter(!col("ndv_approx_ok")).count() == 0)
  }

  test("x10 skew report: totals reconcile, hot key diagnosed, ratios consistent") {
    val r = q("x10_skew_report")
    assert(r.count() == 3)
    val nEvents = Tables(spark, sf, "events").count()
    // both events rows account for every event row exactly once
    assert(r.filter(col("key_col").startsWith("events."))
      .filter(col("n_rows") =!= nEvents).count() == 0)
    // internal consistency: max <= rows, keys <= rows, shares bounded
    assert(r.filter(col("max_key_ct") > col("n_rows") ||
      col("n_keys") > col("n_rows") ||
      col("top1_share") <= 0 || col("top1_share") > 1).count() == 0)
    // hottest-vs-average can never be below uniform (tolerate rounding)
    assert(r.filter(col("skew_factor") < 0.999999).count() == 0)
    // the 5-key event_type space is the documented hot case: far fewer
    // keys and a far larger top-1 share than the user_id key
    val byKey = r.collect().map(row =>
      row.getString(0) -> (row.getLong(2), row.getDouble(4))).toMap
    assert(byKey("events.event_type")._1 < byKey("events.user_id")._1)
    assert(byKey("events.event_type")._2 > byKey("events.user_id")._2)
  }

  test("a22 bounce rate: rates bounded, sessions reconcile with a23") {
    val r = q("a22_bounce_rate").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (sess, bounce) = (row.getLong(1), row.getLong(2))
      assert(bounce >= 0 && bounce <= sess, s"bounce > sessions: $row")
      val rate = row.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - bounce.toDouble / sess) < 1e-6)
    }
    // every session lands on exactly one channel: the per-channel
    // session counts must sum to a23's corpus-wide session count
    // (same 30-min-gap sessionization — the shared-core contract)
    val total = r.map(_.getLong(1)).sum
    val a23 = q("a23_session_funnel").head.getLong(0)
    assert(total == a23, s"a22 sessions $total != a23 sessions $a23")
  }

  test("j12 referential audit: counts partition, star schema is clean") {
    val r = q("j12_ref_integrity")
    assert(r.count() == 3)
    assert(r.filter(col("matched_ct") + col("orphan_ct") +
      col("null_key_ct") =!= col("child_ct")).count() == 0)
    // the generated star schema has no orphans — a nonzero count here
    // is exactly the quarantine signal the audit exists to raise
    assert(r.filter(col("orphan_ct") =!= 0).count() == 0)
    // child counts match the raw tables
    val li = Tables(spark, sf, "lineitem").count()
    assert(r.filter(col("fk_edge") === "lineitem->orders")
      .head.getLong(1) == li)
  }

  test("a29 top paths: 3-step shapes, counts ranked, bounded by events") {
    val r = q("a29_top_paths").collect()
    // sf0.001 has few sessions with >= 3 events — the cut is AT MOST 10
    assert(r.nonEmpty && r.length <= 10)
    assert(r.forall(_.getString(0).split(">").length == 3))
    val cts = r.map(x => x.getLong(x.fieldIndex("path_ct")))
    assert(cts.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "not ranked")
    assert(cts.sum <= Tables(spark, sf, "events").count())
  }

  test("a32 streaks: ranked, bounded, top user matches a brute replay") {
    val r = q("a32_active_streak").collect()
    assert(r.nonEmpty && r.length <= 10)
    val streaks = r.map(x => x.getLong(x.fieldIndex("streak_days")))
    assert(streaks.forall(_ >= 1))
    assert(streaks.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "not ranked by streak")
    assert(r.forall(_.getLong(3) >= 1), "island_ct must be >= 1")
    // brute replay for the top user: longest consecutive run over their
    // distinct epoch days, computed directly in Scala
    val top = r.head
    val uid = top.getLong(top.fieldIndex("user_id"))
    val days = Tables(spark, sf, "events")
      .filter(col("user_id") === uid)
      .select(graft.functions.Fns.divFloor(
        graft.functions.Fns.nsToUs(col("ts")), 86400000000L).as("d"))
      .distinct().collect().map(_.getLong(0)).sorted
    val best = days.foldLeft((0L, 0L, Long.MinValue)) {
      case ((bestRun, run, prev), d) =>
        val nr = if (d == prev + 1) run + 1 else 1L
        (math.max(bestRun, nr), nr, d)
    }._1
    assert(top.getLong(top.fieldIndex("streak_days")) == best,
      s"user $uid: engine streak vs brute $best")
  }

  test("k9 SCD2 audit: clean on k6's history, flags injected damage") {
    val r = q("k9_scd2_integrity").head()
    val idx = r.fieldIndex _
    assert(r.getBoolean(idx("scd2_ok")), s"k6 history must audit clean: $r")
    assert(r.getLong(idx("gap_dim_ct")) == 0 &&
      r.getLong(idx("bad_open_dim_ct")) == 0 &&
      r.getLong(idx("broken_link_ct")) == 0)
    val li = Tables(spark, sf, "lineitem")
    assert(r.getLong(idx("dim_ct")) ==
      li.select(col("l_orderkey")).distinct().count())
    assert(r.getLong(idx("version_ct")) == li.count())
    // negative case: a hand-damaged history (version gap, double-open
    // chain, broken hand-off) must trip every counter
    import spark.implicits._
    val bad = Seq(
      // id 1: versions 1,3 (gap) and two open rows
      (1L, 1, 10L, Option.empty[Long], false),
      (1L, 3, 20L, Option.empty[Long], true),
      // id 2: closed row hands off to a mismatched valid_from
      (2L, 1, 10L, Some(15L), false),
      (2L, 2, 99L, Option.empty[Long], true),
      // id 3: duplicate version offsetting a hole — max = count = 2,
      // the damage the distinct-version rule exists for
      (3L, 2, 10L, Some(20L), false),
      (3L, 2, 20L, Option.empty[Long], true)
    ).toDF("id", "version", "valid_from_seq", "valid_to_seq", "is_current")
    val audit = graft.operators.EnvelopeOps.scd2Audit(bad).head()
    val aidx = audit.fieldIndex _
    assert(!audit.getBoolean(aidx("scd2_ok")))
    assert(audit.getLong(aidx("gap_dim_ct")) == 2,
      "duplicate-version damage must count as a gap")
    assert(audit.getLong(aidx("bad_open_dim_ct")) == 1)
    assert(audit.getLong(aidx("broken_link_ct")) == 1)
  }

  test("k10 SCD2 repair: k9's damaged frame audits clean after repair") {
    import spark.implicits._
    // the same damage menu the k9 test proves the audit CATCHES —
    // gap + double-open, handoff break, duplicate versions
    val bad = Seq(
      (1L, 1, 10L, Option.empty[Long], false),
      (1L, 3, 20L, Option.empty[Long], true),
      (2L, 1, 10L, Some(15L), false),
      (2L, 2, 99L, Option.empty[Long], true),
      (3L, 2, 10L, Some(20L), false),
      (3L, 2, 20L, Option.empty[Long], true)
    ).toDF("id", "version", "valid_from_seq", "valid_to_seq", "is_current")
    assert(!graft.operators.EnvelopeOps.scd2Audit(bad)
      .head().getAs[Boolean]("scd2_ok"))
    val repaired = graft.api.Graft.scd2Repair(bad)
    val audit = graft.operators.EnvelopeOps.scd2Audit(repaired).head()
    assert(audit.getAs[Boolean]("scd2_ok"),
      s"repaired frame must audit clean: $audit")
    // repair is row-preserving and deterministic: versions are 1..n in
    // valid_from order, exactly one open row per id
    assert(repaired.count() == bad.count())
    val byId = repaired.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1)))
    byId.foreach { case (id, rows) =>
      assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length),
        s"id $id versions not 1..n")
      assert(rows.count(_.isNullAt(3)) == 1, s"id $id open rows != 1")
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) == b.getLong(2), s"id $id handoff break")
        case _ => ()
      }
    }
    // repairing an already-clean history is the identity on the chain
    val clean = q("k6_scd2_history")
      .select(col("id"), col("version"), col("valid_from_seq"),
        col("valid_to_seq"), col("is_current"))
    val again = graft.api.Graft.scd2Repair(clean)
    assert(again.exceptAll(clean).isEmpty && clean.exceptAll(again).isEmpty,
      "repair must be identity on a clean history")
    // and the registered k10 report proves the big damaged frame heals
    val rep = q("k10_scd2_repair").head()
    assert(rep.getAs[Boolean]("scd2_ok"))
    assert(rep.getAs[Long]("renumbered_ct") > 0 &&
      rep.getAs[Long]("closed_open_ct") > 0, s"damage must be non-trivial: $rep")
  }

  test("a34 concentration: deciles cover all users, shares ranked") {
    val r = q("a34_user_concentration").collect().sortBy(_.getInt(0))
    assert(r.length == 10)
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(r.map(_.getLong(1)).sum == users, "deciles must cover users")
    assert(r.map(_.getLong(2)).sum == Tables(spark, sf, "events").count())
    // deciles are ranked by per-user event count, so per-decile share
    // falls (weakly) as the decile index grows, and the curve closes
    val shares = r.map(x => x.getDouble(x.fieldIndex("share")))
    assert(shares.sliding(2).forall(p => p.length < 2 ||
      p(0) >= p(1) - 1e-9), "decile shares must be non-increasing")
    assert(math.abs(
      r.last.getDouble(r.last.fieldIndex("cum_share")) - 1.0) < 1e-9)
  }

  test("deciles helper: bit-equal to ntile(10) on skewed, tied, tiny inputs") {
    import org.apache.spark.sql.expressions.Window
    val sess = spark
    import sess.implicits._
    // shapes that stress the closed-form tile arithmetic: n % 10 != 0,
    // heavy ties (one dominant value), and n < 10 (per-row tiles, the
    // divide-by-zero-guard branch)
    val shapes = Seq(
      (1 to 997).map(i => (s"u$i", Option((i % 37).toLong))), // ties+rem 7
      (1 to 1000).map(i =>
        (s"u$i", Option(if (i < 900) 1L else i.toLong))),     // skew
      (1 to 7).map(i => (s"u$i", Option(i.toLong))),          // n < 10
      // NULL sort values: ntile still tiles them (desc puts them last);
      // the null-safe join must keep them
      (1 to 40).map(i =>
        (s"u$i", if (i % 5 == 0) Option.empty[Long] else Some(i.toLong))))
    shapes.foreach { rows =>
      val df = rows.toDF("user_id", "ev_ct")
      val want = df.withColumn("decile", ntile(10).over(
          Window.orderBy(col("ev_ct").desc, col("user_id"))))
        .select(col("user_id"), col("decile"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val got = graft.operators.WindowAggs.deciles(df, "ev_ct", "user_id")
        .select(col("user_id"), col("decile"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == want, s"n=${rows.length}")
    }
  }

  test("exactNtile: bit-equal to ntile(n) for any n, direction, and " +
      "coarse monotone buckets") {
    import org.apache.spark.sql.expressions.Window
    val sess = spark
    import sess.implicits._
    // same stress shapes as the deciles case (ties, skew, tiny, NULLs)
    val shapes = Seq(
      (1 to 997).map(i => (s"u$i", Option((i % 37).toLong))),
      (1 to 1000).map(i =>
        (s"u$i", Option(if (i < 900) 1L else i.toLong))),
      (1 to 7).map(i => (s"u$i", Option(i.toLong))),
      (1 to 40).map(i =>
        (s"u$i", if (i % 5 == 0) Option.empty[Long] else Some(i.toLong))))
    for (rows <- shapes; n <- Seq(4, 5, 32); desc <- Seq(true, false)) {
      val df = rows.toDF("user_id", "ev_ct")
      val ord = if (desc) col("ev_ct").desc else col("ev_ct").asc
      val want = df.withColumn("t", ntile(n).over(
          Window.orderBy(ord, col("user_id"))))
        .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
      // exact-value buckets AND a coarse DIV-3 bucket (the domain-
      // bounded form a37/c19/x4 use): both must reproduce ntile —
      // the bucket only relocates WHERE the offset aggregate splits
      val gotExact = graft.operators.WindowAggs.exactNtile(
          df, n, col("ev_ct"), desc, Seq(col("user_id")), "t")
        .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
      // integer DIV truncates toward zero — monotone here because the
      // test values are non-negative (as are all production buckets).
      // The within-bucket residual order must carry the DIRECTION too
      // (a coarse bucket holds several sort values; exact buckets
      // don't care)
      val gotCoarse = graft.operators.WindowAggs.exactNtile(
          df, n, expr("ev_ct DIV 3"), desc,
          Seq(ord, col("user_id")), "t")
        .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
      assert(gotExact == want, s"exact n=$n desc=$desc sz=${rows.length}")
      assert(gotCoarse == want, s"coarse n=$n desc=$desc sz=${rows.length}")
    }
  }

  test("exactNtileMulti: one shared stats pass, bit-equal to the " +
      "chained exactNtile (the a37 shape)") {
    import org.apache.spark.sql.expressions.Window
    val sess = spark
    import sess.implicits._
    // a37-shaped frame: three metrics with ties, skew, and NULLs
    val df = (1 to 500).map { i =>
      (s"u$i", (i % 23).toLong, (i % 7).toLong,
        if (i % 11 == 0) Option.empty[Long] else Some((i % 40).toLong))
    }.toDF("user_id", "rec", "freq", "mon")
    val specs = Seq(
      (5, expr("rec DIV 3"), false,
        Seq(col("rec"), col("user_id")), "r_score"),
      (5, col("freq"), false, Seq(col("user_id")), "f_score"),
      (4, col("mon"), true, Seq(col("user_id")), "m_score"))
    val chained = specs.foldLeft(df) {
      case (acc, (n, bucket, desc, inB, out)) =>
        graft.operators.WindowAggs.exactNtile(acc, n, bucket, desc,
          inB, out)
    }.select(col("user_id"), col("r_score"), col("f_score"),
      col("m_score"))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val multi = graft.operators.WindowAggs.exactNtileMulti(df, specs)
      .select(col("user_id"), col("r_score"), col("f_score"),
        col("m_score"))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(multi == chained)
    // and each score alone equals the plain window ntile
    for (((n, bucket, desc, _, out), ord) <- specs.zip(Seq(
        Seq(col("rec").asc, col("user_id").asc),
        Seq(col("freq").asc, col("user_id").asc),
        Seq(col("mon").desc, col("user_id").asc)))) {
      val want = df.withColumn(out, ntile(n).over(Window.orderBy(ord: _*)))
        .select(col("user_id"), col(out))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val got = graft.operators.WindowAggs.exactNtileMulti(df, specs)
        .select(col("user_id"), col(out))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == want, s"$out vs window ntile")
    }
  }

  test("a38 percentiles: monotone, bracketed by min/max, exact count") {
    val r = q("a38_event_percentiles").head()
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("user_ct") == users)
    val seq = Seq("min_ct", "p25", "p50", "p75", "p90", "p99", "max_ct")
      .map(c => r.getAs[Long](c))
    assert(seq.sliding(2).forall(p => p(0) <= p(1)),
      s"percentile curve not monotone: $seq")
    // p50 equals the rank-picked median of the exact distribution
    val want = Tables(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("ev_ct"))
      .orderBy(col("ev_ct"), col("user_id"))
      .collect().map(_.getLong(1))
    assert(r.getAs[Long]("p50") ==
      want(math.max(math.ceil(0.5 * want.length).toInt, 1) - 1))
  }

  test("k16 repair ledger: folds exactly the k14 quarantine set") {
    val q14 = q("k14_ooo_quarantine")
    val r = q("k16_repair_ledger").collect()
    assert(r.map(_.getAs[Long]("quarantined_ct")).sum == q14.count())
    r.foreach { row =>
      // displacement is positive by construction: a quarantined op's
      // seq sorts strictly below the open version it violated
      assert(row.getAs[Long]("max_displacement") > 0)
      assert(row.getAs[Double]("mean_displacement") > 0)
    }
  }

  test("a33 gap calibration: dense spine, closed totals, monotone curve") {
    val r = q("a33_session_gap_calibration").collect()
    assert(r.length == 6, "all six buckets must be stated")
    assert(r.map(_.getString(0)).sorted.sameElements(
      Array("a_lt_10s", "b_lt_1m", "c_lt_10m", "d_lt_30m", "e_lt_1h",
        "f_ge_1h")))
    val ordered = r.sortBy(_.getString(0))
    val cum = ordered.map(x => x.getDouble(x.fieldIndex("cum_share")))
    assert(cum.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(math.abs(cum.last - 1.0) < 1e-9, s"curve must close at 1.0")
    // every user's events produce exactly (n_events - 1) gaps
    val ev = Tables(spark, sf, "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(ordered.map(_.getLong(1)).sum == expected)
  }

  test("a28 rolling WAU: wau >= dau, stickiness in (0,1]") {
    val r = q("a28_rolling_wau")
    assert(r.count() > 0)
    assert(r.filter(col("wau") < col("dau")).count() == 0)
    assert(r.filter(col("stickiness") <= 0 || col("stickiness") > 1)
      .count() == 0)
    // a day whose whole week is itself has stickiness exactly 1 —
    // the first active day can only see itself if nothing precedes it
    val firstDay = r.agg(min(col("day"))).head.getLong(0)
    val f = r.filter(col("day") === firstDay).head
    assert(f.getLong(f.fieldIndex("wau")) >=
      f.getLong(f.fieldIndex("dau")))
  }

  test("v13 drift: every label covered, both epochs populated, drift > 0") {
    val r = q("v13_centroid_drift")
    val labels = Tables(spark, sf, "embeddings")
      .select(col("label")).distinct().count()
    assert(r.count() == labels)
    assert(r.filter(col("epoch0_ct") === 0 || col("epoch1_ct") === 0)
      .count() == 0)
    // random embeddings: two epoch centroids never coincide exactly
    assert(r.filter(col("drift") <= 0).count() == 0)
    // epoch counts add up to the label's vector count
    val per = Tables(spark, sf, "embeddings").groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
      .withColumnRenamed("label", "l2")
    assert(r.join(per, col("label") === col("l2"))
      .filter(col("epoch0_ct") + col("epoch1_ct") =!= col("n"))
      .count() == 0)
  }

  test("k8: incremental delta maintenance reconciles with the k5 merged snapshot") {
    val k8 = q("k8_incremental_agg").collect()
    val k5 = q("k5_dim_merge_snapshot")
    // the delta stream's per-group live counts and amounts must
    // telescope to exactly the snapshot rollup: same live keys...
    assert(k8.map(_.getLong(2)).sum == k5.count())
    // ...and the same total amount (DECIMAL deltas cancel exactly, so
    // the double rendering agrees to the cent)
    val k8Amt = BigDecimal(k8.map(_.getDouble(1)).sum)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val k5Amt = BigDecimal(
      k5.agg(sum(col("final_price"))).head.getDouble(0))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    assert(k8Amt == k5Amt, s"delta=$k8Amt snapshot=$k5Amt")
    // every group key is a partkey residue and every group is live
    assert(k8.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 7
      && r.getLong(2) > 0))
  }

  test("a31: spine is dense, observed days reconcile, LOCF copies the last observation") {
    val r = q("a31_gap_fill").collect()
    val o = Tables(spark, sf, "orders")
    val span = o.agg((datediff(max(to_date(col("o_orderdate"))),
      min(to_date(col("o_orderdate")))) + 1).as("days")).head.getInt(0)
    val groups = o.select(col("o_orderpriority")).distinct().count()
    // every (priority, calendar day) appears exactly once
    assert(r.length == span * groups, s"${r.length} vs $span*$groups")
    // observed rows = the actual (priority, day) pairs with orders
    val observed = o.groupBy(col("o_orderpriority"),
      to_date(col("o_orderdate"))).count().count()
    assert(r.count(_.getBoolean(2)) == observed)
    // on observed days LOCF equals the day amount; unobserved days are 0
    assert(r.filter(_.getBoolean(2))
      .forall(x => x.getDouble(3) == x.getDouble(4)))
    assert(r.filter(!_.getBoolean(2)).forall(_.getDouble(3) == 0.0))
    // LOCF never invents values: per series it is monotone in history —
    // an unobserved day repeats SOME earlier day's amount (or 0 before
    // the first observation)
    val byPr = r.groupBy(_.getString(0))
    byPr.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getString(1))
      var lastSeen = 0.0
      sorted.foreach { x =>
        if (x.getBoolean(2)) lastSeen = x.getDouble(3)
        assert(x.getDouble(4) == lastSeen, s"locf broke at ${x.getString(1)}")
      }
    }
  }

  test("a30: anomaly gate consistent, warm-up window sane, day one is its own baseline") {
    val r = q("a30_revenue_anomaly")
    val days = Tables(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd")).distinct().count()
    assert(r.count() == days)
    assert(r.filter(col("n28") < 1 || col("n28") > 28).count() == 0)
    // flag is exactly the |z| > 2 predicate
    assert(r.filter(col("anomaly") =!= (abs(col("z")) > 2.0)).count() == 0)
    // the first day sees only itself: zero variance, zero score
    val first = r.orderBy(col("cur_date")).limit(1).head
    assert(first.getLong(2) == 1L)
    assert(first.getDouble(5) == 0.0)
    assert(math.abs(first.getDouble(3) - first.getDouble(1)) < 1e-6)
    // past the warm-up every window is full
    assert(r.orderBy(col("cur_date")).collect().drop(27)
      .forall(_.getLong(2) == 28L))
  }

  test("x8: skip accounting closes and z-order skips at least as much as date sort") {
    val r = q("x8_skip_stats")
    assert(r.count() == 32) // 2 layouts x 4x4 predicate grid
    assert(r.filter(col("buckets_read") + col("buckets_skipped") =!=
      col("bucket_ct")).count() == 0)
    // every predicate box lies inside the data domain: something is read
    assert(r.filter(col("buckets_read") < 1).count() == 0)
    assert(r.filter(col("rows_read") <= 0).count() == 0)
    // the point of z-order: across the 2-D predicate grid it reads no
    // more files than the single-dimension sort, and strictly fewer in
    // total (the date layout cannot prune the custkey dimension)
    val tot = r.groupBy(col("layout"))
      .agg(sum(col("buckets_read")).as("rd")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tot("zorder") < tot("bydate"),
      s"zorder read ${tot("zorder")} vs bydate ${tot("bydate")}")
  }

  test("w6: late accounting closes, every event lands once, drops exist") {
    val r = q("w6_late_audit")
    // per-window closure and non-negativity
    assert(r.filter(col("arrived_ct") =!=
      col("late_ct") + col("kept_ct")).count() == 0)
    assert(r.filter(col("late_ct") < 0 ||
      col("late_ct") > col("arrived_ct")).count() == 0)
    // conservation: the audit neither drops nor double-counts events
    val total = r.agg(sum(col("arrived_ct"))).head.getLong(0)
    assert(total == Tables(spark, sf, "events").count())
    // windows are unique keys
    assert(r.select(col("stt")).distinct().count() == r.count())
    // the disorder model must actually exercise the drop rule — a
    // zero-late audit would silently assert nothing (the raw testdata is
    // perfectly ordered; the jittered arrival is what makes W6 testable)
    val late = r.agg(sum(col("late_ct"))).head.getLong(0)
    assert(late > 0, "no late events: disorder model degenerate")
    assert(late < total, "everything late: watermark model broken")
  }

  test("d11 shape grid covers exactly the factorings of the K budget") {
    // a future K change must not silently leave the sweep partial —
    // the table's claim is EVERY way to spend the signature budget
    val k = operators.DedupOps.numHashes
    val want = (1 to k).filter(k % _ == 0).map(b => (b, k / b)).toSet
    assert(operators.DedupOps.lshShapes.toSet == want,
      s"lshShapes != all factorings of K=$k")
  }

  test("a36 attribution: bucketed pairing == naive horizon join; " +
      "a whale user's enumeration is per-bucket-bounded") {
    import spark.implicits._
    val h = operators.WindowAggs.attributionHorizonSec
    // planted whale: user 1 touches every 30 min and purchases every
    // 2 h across 100 h — the round-8 verdict's hyperactive-user shape.
    // Edges: a touch exactly at p_sec - h (qualifies, PREVIOUS hour
    // bucket), an untouched purchase, a touch after the purchase
    // (excluded), a user with touches but no purchases.
    val touches = ((0 until 200).map(i =>
        (1L, 1000L + i, i.toLong * 1800L,
          if (i % 2 == 0) "view" else "click")) ++ Seq(
        (2L, 5000L, 100L, "view"),       // exactly at 3700 - h
        (2L, 5001L, 4000L, "click"),     // after the purchase: excluded
        (3L, 5002L, 50L, "view")))       // user with no purchases
      .toDF("t_uid", "t_id", "t_sec", "channel")
    val purchases = ((0 until 50).map(i =>
        (1L, 2000L + i, i.toLong * 7200L + 100L, 10.0)) ++ Seq(
        (2L, 6000L, 3700L, 20.0),        // its only touch is the = edge
        (2L, 6001L, 999999L, 5.0)))      // untouched purchase
      .toDF("p_uid", "p_id", "p_sec", "p_value")

    // 1. semantics: the bucketed pairing emits EXACTLY the naive
    // user-keyed horizon join's pairs (each pair once)
    val bucketed = operators.WindowAggs.attributionPairs(purchases, touches)
    val naive = purchases.join(touches,
        col("p_uid") === col("t_uid") &&
          col("t_sec") <= col("p_sec") &&
          col("t_sec") >= col("p_sec") - h)
      .select(col("p_id"), col("p_value"), col("channel"), col("t_sec"),
        col("t_id"))
    assert(bucketed.count() == bucketed.distinct().count(),
      "bucket decomposition duplicated a pair")
    assert(bucketed.exceptAll(naive).isEmpty &&
      naive.exceptAll(bucketed).isEmpty,
      "bucketed pairing diverges from the naive horizon join")

    // 2. the full report equals the naive (pre-round-9) formulation
    val report = operators.WindowAggs.attributionFor(purchases, touches)
    import org.apache.spark.sql.expressions.Window
    val wP = Window.partitionBy(col("p_id"))
    def naiveReportOf(purchases: org.apache.spark.sql.DataFrame) =
      purchases.join(touches,
        col("p_uid") === col("t_uid") &&
          col("t_sec") <= col("p_sec") &&
          col("t_sec") >= col("p_sec") - h, "left_outer")
      .withColumn("n_touches", count(col("t_id")).over(wP))
      .withColumn("rk", row_number().over(wP.orderBy(
        col("t_sec").desc_nulls_last, col("t_id").desc_nulls_last)))
      .select(coalesce(col("channel"), lit("(none)")).as("channel"),
        when(col("rk") === 1, 1L).otherwise(0L).as("is_last"),
        when(col("rk") === 1, graft.functions.Fns.money(col("p_value")))
          .otherwise(lit(null)).as("lt_rev"),
        when(col("n_touches") > 0, round(col("p_value") / col("n_touches"), 6)
            .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .when(col("rk") === 1, graft.functions.Fns.money(col("p_value"))
            .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .otherwise(lit(null)).as("lin_rev"))
      .groupBy(col("channel"))
      .agg(sum(col("is_last")).as("purchase_ct"),
        sum(col("lt_rev")).cast("double").as("last_touch_revenue"),
        sum(col("lin_rev")).cast("double").as("linear_revenue"))
    val naiveReport = naiveReportOf(purchases)
    assert(report.collect().toSet == naiveReport.collect().toSet,
      s"report diverges:\n${report.collect().toSeq}\n" +
        s"${naiveReport.collect().toSeq}")
    // all-touched corpus: the sentinel rows must NOT grow a
    // zero-purchase "(none)" group the left-outer form never had
    val allTouched = purchases.filter(col("p_id") =!= 6001L)
    val reportAT =
      operators.WindowAggs.attributionFor(allTouched, touches)
    assert(reportAT.filter(col("channel") === "(none)").count() == 0,
      "phantom (none) group on an all-touched corpus")
    assert(reportAT.collect().toSet ==
      naiveReportOf(allTouched).collect().toSet)

    // 3. the whale bound: the bucket join's enumeration is
    // sum-over-buckets of (probes × touches), which must stay far
    // below the naive user-keyed product the old plan enumerated
    val probeCts = purchases
      .withColumn("pb0", floor(col("p_sec") / h))
      .withColumn("pb", explode(array(col("pb0") - 1, col("pb0"))))
      .groupBy(col("p_uid"), col("pb")).count()
      .select(col("p_uid").as("u"), col("pb").as("b"),
        col("count").as("np"))
    val touchCts = touches
      .withColumn("tb", floor(col("t_sec") / h))
      .groupBy(col("t_uid"), col("tb")).count()
      .select(col("t_uid").as("u"), col("tb").as("b"),
        col("count").as("nt"))
    val bucketEnum = probeCts.join(touchCts, Seq("u", "b"))
      .agg(sum(col("np") * col("nt"))).head.getLong(0)
    val naiveEnum = purchases.groupBy(col("p_uid")).count()
      .select(col("p_uid").as("u"), col("count").as("np"))
      .join(touches.groupBy(col("t_uid")).count()
        .select(col("t_uid").as("u"), col("count").as("nt")), Seq("u"))
      .agg(sum(col("np") * col("nt"))).head.getLong(0)
    assert(naiveEnum >= 10000L, s"fixture degenerate: naive $naiveEnum")
    assert(bucketEnum * 10 <= naiveEnum,
      s"bucket enumeration $bucketEnum not << naive $naiveEnum — " +
        "the whale bound is broken")
    assert(bucketEnum >= bucketed.count(),
      "enumeration accounting inconsistent")
  }
}
