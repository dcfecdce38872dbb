package graft

import org.apache.spark.sql.functions._
import graft.api.Graft

/** The facade contract: every Graft entry point works on ARBITRARY
  * user DataFrames — none of these tests touch the driver's testdata. */
class ApiSpec extends SparkSuite {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "web", "the quick brown fox jumps over the lazy dog today"),
    (2L, "web", "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "web", "completely different content about spark catalyst planning"),
    (4L, "book", "the quick brown fox jumps over the lazy dog today"),
    (5L, "web", "another unrelated document discussing lakehouse tables")
  ).toDF("doc_id", "source", "text")

  test("nearDupPairs + componentLabels cluster the planted near-dups") {
    val pairs = Graft.nearDupPairs(corpus, threshold = 0.7)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1 and 2 differ by one token (J = 9/11); 4 is identical text to 1
    // but in another source (blocking key) so it is NOT a candidate
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    val labels = Graft.nearDupClusters(corpus, threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L))
    // the shared signature stage: one row per (doc, band)
    assert(Graft.bandSignatures(corpus).count() ==
      corpus.count() * operators.DedupOps.numBands)
  }

  test("cdcChunks tile user docs completely and shift-stably") {
    val c = Graft.cdcChunks(corpus).collect()
    // chunks tile each document exactly: token mass is conserved
    val tokCt = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(2).split(" ").length).toMap
    c.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      assert(rows.map(_.getLong(rows.head.fieldIndex("len"))).sum ==
        tokCt(id), s"doc $id chunk mass")
    }
    // docs 1 and 4 carry identical text -> identical chunk fp sets
    def fps(id: Long) = c.filter(_.getLong(0) == id)
      .map(_.getString(c.head.fieldIndex("fp"))).toSet
    assert(fps(1L) == fps(4L))
  }

  test("zipfFit slopes are negative on repetitive user text") {
    val r = Graft.zipfFit(corpus).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(row.fieldIndex("zipf_slope")) < 0)
    }
  }

  test("kAnonymityClasses flags small quasi-identifier classes") {
    val visits = Seq(
      ("F", 30, 101L), ("F", 30, 102L), ("F", 30, 103L),
      ("F", 30, 101L),               // repeat record, same subject
      ("M", 30, 201L), ("M", 30, 202L),
      ("M", 40, 301L)                // the k=2 risky singleton class
    ).toDF("sex", "age", "patient")
    val r = Graft.kAnonymityClasses(visits,
        Seq(col("sex"), col("age")), col("patient"), k = 2)
      .collect().map(x => (x.getString(0), x.getInt(1)) ->
        ((x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    assert(r(("F", 30)) == ((3L, 4L, false)))
    assert(r(("M", 30)) == ((2L, 2L, false)))
    assert(r(("M", 40)) == ((1L, 1L, true)))
    intercept[IllegalArgumentException] {
      Graft.kAnonymityClasses(visits, Seq.empty, col("patient"))
    }
  }

  test("chunks tile a user corpus with the requested geometry") {
    val c = Graft.chunks(corpus, size = 4L, stride = 3L)
    val row1 = c.filter(col("doc_id") === 1L).orderBy(col("chunk_idx"))
      .collect()
    // 10 tokens, size 4, stride 3 -> starts 0,3,6; the last chunk ends
    // exactly at token 10, so every position is covered
    assert(row1.map(_.getLong(2)).toSeq == Seq(0L, 3L, 6L))
    assert(row1.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L))
    // identical text => identical chunk fingerprints (docs 1 and 4)
    val fp1 = c.filter(col("doc_id") === 1L && col("chunk_idx") === 0)
      .head.getString(4)
    val fp4 = c.filter(col("doc_id") === 4L && col("chunk_idx") === 0)
      .head.getString(4)
    assert(fp1 == fp4)
  }

  test("topKPerGroup and hashSplit behave on arbitrary frames") {
    val sales = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 4L, 5.0)).toDF("grp", "id", "amt")
    val top = Graft.topKPerGroup(sales, Seq("grp"), col("amt"), col("id"), 2)
    assert(top.filter(col("grp") === "a").collect()
      .map(_.getLong(1)).toSet == Set(2L, 3L))
    assert(top.filter(col("grp") === "b").count() == 1)

    val split = Graft.hashSplit(sales, col("id"))
    assert(split.count() == 4)
    assert(split.filter(!col("split").isin("train", "val", "test"))
      .count() == 0)
    // deterministic: same assignment on re-evaluation
    val a = split.orderBy("id").collect().map(_.getString(3)).toSeq
    val b = Graft.hashSplit(sales, col("id")).orderBy("id").collect()
      .map(_.getString(3)).toSeq
    assert(a == b)
  }

  test("asofJoin matches each left row to the latest earlier right row") {
    val quotes = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("k", "qt")
    val trades = Seq((1L, 15L), (1L, 25L), (2L, 10L), (3L, 9L))
      .toDF("k", "tt")
    val got = Graft.asofJoin(trades, quotes, "k", "tt", "qt")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, 15L, 10L), (1L, 25L, 20L), (2L, 10L, -1L),
      (3L, 9L, -1L)), s"got $got")
  }

  test("asofJoin tolerance: None ≡ all matches fresh; 0 ⇒ only " +
      "exact-time matches fresh; stale keeps the measurable match") {
    val quotes = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("k", "qt")
    val trades = Seq((1L, 15L), (1L, 20L), (2L, 10L), (3L, 9L))
      .toDF("k", "tt")
    def rows(tol: Option[Long]) =
      Graft.asofJoin(trades, quotes, "k", "tt", "qt", tol)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3))).toSet
    // tolerance=None: identical asof_time to the plain call, and every
    // matched row is fresh / every unmatched row cold
    val none = rows(None)
    assert(none == Set((1L, 15L, 10L, "fresh"), (1L, 20L, 20L, "fresh"),
      (2L, 10L, -1L, "cold"), (3L, 9L, -1L, "cold")), s"got $none")
    // tolerance=0: only the exact-time match stays fresh; the older
    // match flips to stale but its asof_time is still reported
    val zero = rows(Some(0L))
    assert(zero == Set((1L, 15L, 10L, "stale"), (1L, 20L, 20L, "fresh"),
      (2L, 10L, -1L, "cold"), (3L, 9L, -1L, "cold")), s"got $zero")
    // a mid tolerance splits on the gap bound (gap 5 vs tolerance 4/5)
    val four = rows(Some(4L))
    assert(four.contains((1L, 15L, 10L, "stale")), s"got $four")
    assert(rows(Some(5L)).contains((1L, 15L, 10L, "fresh")))
  }

  test("hll and cms sketches aggregate arbitrary columns") {
    val events = (1 to 1000).map(i => (s"user${i % 137}", s"tok${i % 7}"))
      .toDF("user", "tok")
    val uv = events.agg(Graft.hll(col("user"))).head.getLong(0)
    assert(math.abs(uv - 137) <= 137 * 0.05, s"hll said $uv for 137")
    val sk = events.agg(Graft.cms(col("tok"))).head.getAs[Array[Byte]](0)
    // every token occurs ceil/floor of 1000/7 times; estimate >= truth
    (0 until 7).foreach { t =>
      val est = graft.functions.CmsSketch.estimate(sk, s"tok$t")
      assert(est >= 1000 / 7, s"tok$t estimated $est")
    }
  }

  test("contamination flags the planted train/eval overlap only") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "nothing in common with anything else at all here")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (20L, "alpha beta gamma delta epsilon zeta iota kappa"),
      (21L, "fully disjoint evaluation prompt text tokens")
    ).toDF("doc_id", "text")
    val got = Graft.contamination(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 10/20 share the 3-grams of "alpha..zeta" (4 shingles >= 3)
    assert(got == Set((10L, 20L)), s"got $got")
  }

  test("contaminationByDf finds past-the-cap train docs the rank lens " +
      "misses, and drops template shingles") {
    // 30 train docs all share one eval doc's informative phrase — with
    // a rank cap of 5 only the first 5 pair, but every shingle's DF is
    // 30 (under maxDf=50), so the DF lens pairs ALL 30: exact
    // train-side attribution, the documented asymmetry
    val phrase = "alpha beta gamma delta epsilon zeta"
    val train = (1L to 30L).map(i => (i, phrase))
      .toDF("doc_id", "text")
    val eval = Seq((100L, phrase)).toDF("doc_id", "text")
    val rank = Graft.contamination(train, eval, minShared = 3L,
      postingCap = 5)
    val byDf = Graft.contaminationByDf(train, eval, minShared = 3L,
      maxDf = 50L)
    assert(rank.count() == 5, s"rank lens: ${rank.count()}")
    assert(byDf.count() == 30, s"DF lens: ${byDf.count()}")
    // and a TEMPLATE shingle (df above the cap) stops carrying signal
    // in the DF lens — the complementary blind spot, also documented
    val byDfStop = Graft.contaminationByDf(train, eval, minShared = 3L,
      maxDf = 10L)
    assert(byDfStop.count() == 0,
      "df > maxDf shingles must be dropped whole")
  }

  test("lshShapeSweep: every K=12 factoring, analytic recall literals, " +
      "pair mass counted without enumeration") {
    // three identical docs + one unrelated: the identical trio shares
    // its full signature, so every shape's bands each hold one k=3
    // bucket -> candidate_pairs == 3 * bands exactly
    val dup = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, "s", dup), (2L, "s", dup), (3L, "s", dup),
      (4L, "s", "entirely different content with no shared trigrams")
    ).toDF("doc_id", "source", "text")
    val rows = Graft.lshShapeSweep(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(3),
        r.getDouble(5), r.getLong(8))).toSeq
    assert(rows.map(r => (r._1, r._2)).toSet ==
      Set((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)))
    rows.foreach { case (b, r, recall08, measured, pairs) =>
      val want = BigDecimal(1.0 - math.pow(1.0 - math.pow(0.8, r), b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(recall08 == want, s"recall drifted for $b x $r")
      // identical triple: all 3 verified pairs share every band sig,
      // so MEASURED recall is 1.0 under every shape
      assert(measured == 1.0, s"shape $b x $r measured $measured")
      assert(pairs == 3L * b,
        s"shape $b x $r: expected ${3 * b} pairs, got $pairs")
    }
  }

  test("fuzzyContamination flags the near-identical cross-split copy") {
    val train = Seq(
      (10L, "s", "alpha beta gamma delta epsilon zeta eta theta iota"),
      (11L, "s", "completely unrelated training material nothing shared")
    ).toDF("doc_id", "source", "text")
    val eval = Seq(
      (20L, "s", "alpha beta gamma delta epsilon zeta eta theta kappa"),
      (21L, "s", "another fully disjoint evaluation prompt")
    ).toDF("doc_id", "source", "text")
    val got = Graft.fuzzyContamination(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10/20 share 8 of 10 distinct tokens (J = 0.8 >= 0.5); nothing
    // else shares a band
    assert(got == Set((10L, 20L)), s"got $got")
  }

  test("fuzzyContamination tolerates overlapping train/eval id spaces") {
    // both corpora number from 0 — doc_id 5 exists on BOTH sides with
    // different text; the copy pair uses different ids on each side
    val train = Seq(
      (5L, "s", "the quick brown fox jumps over the lazy dog today"),
      (7L, "s", "alpha beta gamma delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "source", "text")
    val eval = Seq(
      (5L, "s", "entirely different evaluation prompt with no overlap"),
      (9L, "s", "alpha beta gamma delta epsilon zeta eta theta kappa")
    ).toDF("doc_id", "source", "text")
    val got = Graft.fuzzyContamination(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly the planted (7, 9) pair at J = 8/10; never a doc paired
    // against the other side's text for a colliding id
    assert(got.map(x => (x._1, x._2)).toSet == Set((7L, 9L)),
      s"got ${got.toSeq}")
    assert(math.abs(got.head._3 - 0.8) < 1e-9)
  }

  test("releaseManifest and dupSpanExtents run on user frames") {
    val docs = Seq(
      (1L, "web", "one two three four five six seven eight nine ten"),
      (2L, "web", "one two three four five six seven eight nine ten"),
      (3L, "web", "completely different words that repeat in no doc")
    ).toDF("doc_id", "source", "text")
    val man = Graft.releaseManifest(docs)
    assert(man.agg(sum(col("doc_ct"))).head.getLong(0) == 3L)
    // docs 1 and 2 are identical → every 5-gram span duplicated, so
    // both carry one full-coverage extent; doc 3 shares nothing
    val ext = Graft.dupSpanExtents(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cut_frac")))
      .toMap
    assert(ext.keySet == Set(1L, 2L))
    assert(ext.values.forall(_ == 1.0))
  }

  test("snapshotDiff classifies add/remove/change/unchanged") {
    val old = Seq(
      (1L, "s", "kept exactly the same"),
      (2L, "s", "this one gets edited"),
      (3L, "s", "this one gets removed")
    ).toDF("doc_id", "source", "text")
    val nw = Seq(
      (1L, "s", "kept exactly the same"),
      (2L, "s", "this one got edited"),
      (4L, "s", "this one is brand new")
    ).toDF("doc_id", "source", "text")
    val r = Graft.snapshotDiff(old, nw).head
    assert(r.getLong(r.fieldIndex("added_ct")) == 1L)
    assert(r.getLong(r.fieldIndex("removed_ct")) == 1L)
    assert(r.getLong(r.fieldIndex("changed_ct")) == 1L)
    assert(r.getLong(r.fieldIndex("unchanged_ct")) == 1L)
    // the reprocess plan over the SAME pair: 3 docs still present, 3
    // dirtying changes (add+edit+remove), token mass = the added (5
    // tokens) + edited (4 tokens) new-side docs, verdict recompute
    val p = Graft.reprocessPlan(old, nw).head
    assert(p.getLong(p.fieldIndex("new_doc_ct")) == 3L)
    assert(p.getLong(p.fieldIndex("dirty_ct")) == 3L)
    assert(p.getLong(p.fieldIndex("reprocess_tokens")) == 9L)
    assert(p.getString(p.fieldIndex("verdict")) == "recompute")
  }

  test("tableStats and refIntegrityAudit work on user frames") {
    val child = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "ref")
    val parent = Seq(("a", 1), ("c", 2)).toDF("pk", "x")
    val stats = Graft.tableStats(child, Seq("id", "ref")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("id").getLong(1) == 3L) // row_ct
    assert(stats("id").getLong(3) == 3L) // ndv
    assert(stats("id").getBoolean(4)) // approx ndv within contract
    assert(stats("ref").getLong(2) == 1L) // null_ct
    assert(stats("ref").getString(5) == "a") // min
    val audit = Graft.refIntegrityAudit("child->parent", child, "ref",
      parent, "pk").head
    assert(audit.getLong(1) == 3L) // child_ct
    assert(audit.getLong(2) == 1L) // matched ("a")
    // SQL FK convention: NULL child key is vacuously valid, not an
    // orphan — it is reported apart so the audit stays actionable
    assert(audit.getLong(3) == 1L) // orphan ("b")
    assert(audit.getLong(4) == 1L) // null_key_ct (the null ref)
    // the ordinary case: the FK column named identically on both sides
    val orders = Seq((1L, 10L), (2L, 20L)).toDF("oid", "user_id")
    val users = Seq((10L, "u")).toDF("user_id", "name")
    val same = Graft.refIntegrityAudit("orders->users", orders, "user_id",
      users, "user_id").head
    assert(same.getLong(2) == 1L && same.getLong(3) == 1L)
  }

  test("overlapMatrix: exact pairwise segment overlap on user frames, " +
      "and the segment pass navigates onto a registered bitmap summary") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L),
      ("c", 9L)).toDF("seg", "uid")
    val m = Graft.overlapMatrix(df, col("seg"), col("uid"))
      .sort("seg_a", "seg_b").collect()
    assert(m.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      ("a", "b", 3L, 3L, 2L), ("a", "c", 3L, 1L, 0L),
      ("b", "c", 3L, 1L, 0L)))
    assert(math.abs(m(0).getDouble(5) - 2.0 / 4.0) < 1e-12)
    // non-integral ids refuse at analysis (the exactDistinct contract)
    intercept[org.apache.spark.sql.AnalysisException] {
      Graft.overlapMatrix(df.withColumn("s", col("seg")),
        col("seg"), col("s")).collect()
    }
    // over a REGISTERED summary the per-segment pass reads partials,
    // not the base (x24's shape, here on an inline store)
    val root = java.nio.file.Files
      .createTempDirectory("graft_api_overlap_").toString
    try {
      df.write.mode("overwrite").parquet(s"$root/base")
      val base = spark.read.parquet(s"$root/base")
      graft.plans.AggRewrite.materialize(spark, "api_overlap_spec",
        base, keys = Seq("seg" -> col("seg")),
        measures = Seq(("bm", "bitmap", col("uid")),
          ("cnt", "count_star", lit(1))),
        path = s"$root/summary")
      val nav = Graft.overlapMatrix(base, col("seg"), col("uid"))
      val leaves = nav.queryExecution.optimizedPlan.collectLeaves()
        .flatMap {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
          case _ => Nil
        }.toSet
      assert(leaves.exists(_.contains("summary")),
        s"segment pass did not navigate: $leaves")
      assert(!leaves.exists(_.contains("base")),
        s"base still scanned: $leaves")
      assert(nav.sort("seg_a", "seg_b").collect().map(_.toSeq).toSeq ==
        m.map(_.toSeq).toSeq)
      // Graft.exactDistinct itself navigates the same way (the
      // one-pass aggregator maps onto the finish template)
      def edQ = base.groupBy(col("seg"))
        .agg(Graft.exactDistinct(col("uid")).as("uv"))
      val ed = graft.plans.AggRewrite.navigate(edQ)
      val edLeaves = ed.queryExecution.optimizedPlan.collectLeaves()
        .flatMap {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
          case _ => Nil
        }.toSet
      assert(edLeaves.exists(_.contains("summary")),
        s"exactDistinct did not navigate: $edLeaves")
      assert(ed.sort("seg").collect().toSeq ==
        edQ.sort("seg").collect().toSeq)
    } finally {
      graft.plans.AggRewrite.unregister(spark, "api_overlap_spec")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("retentionCurves: exact cohort retention from per-period " +
      "bitmaps on arbitrary frames") {
    // users 1,2,3 active day 1; 2,3 return day 2; 3 returns day 3;
    // day 4 has a fresh cohort {9}
    val df = Seq(
      ("2024-01-01", 1L), ("2024-01-01", 2L), ("2024-01-01", 3L),
      ("2024-01-02", 2L), ("2024-01-02", 3L),
      ("2024-01-03", 3L),
      ("2024-01-04", 9L)).toDF("day", "uid")
    val r = Graft.retentionCurves(df, col("day"), col("uid"),
        maxOffset = 2)
      .sort("cohort", "offset").collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    // FULL grid: every (cohort, offset) pair has a row — offsets whose
    // target day has no activity report retained = 0, never a hole
    assert(r == Seq(
      ("2024-01-01", 0L, 3L, 3L), ("2024-01-01", 1L, 3L, 2L),
      ("2024-01-01", 2L, 3L, 1L),
      ("2024-01-02", 0L, 2L, 2L), ("2024-01-02", 1L, 2L, 1L),
      ("2024-01-02", 2L, 2L, 0L),
      ("2024-01-03", 0L, 1L, 1L), ("2024-01-03", 1L, 1L, 0L),
      ("2024-01-03", 2L, 1L, 0L),
      ("2024-01-04", 0L, 1L, 1L), ("2024-01-04", 1L, 1L, 0L),
      ("2024-01-04", 2L, 1L, 0L)))
    // retention ratio: exact division, 1.0 on offset 0
    val day1 = Graft.retentionCurves(df, col("day"), col("uid"), 2)
      .filter(col("cohort") === "2024-01-01").sort("offset").collect()
    assert(day1.map(_.getDouble(4)).toSeq == Seq(1.0, 2.0 / 3, 1.0 / 3))
    // non-integral ids refuse at analysis (the exactDistinct contract)
    intercept[org.apache.spark.sql.AnalysisException] {
      Graft.retentionCurves(df.withColumn("s", col("day")),
        col("day"), col("s")).collect()
    }
    // day-grain normalization: two spellings of one day ('2024-1-2'
    // beside '2024-01-02') merge into ONE cohort whose bitmaps union —
    // the raw-value groupBy would emit two cohort rows that each
    // left-join the same target days and double-count retained ids
    val mixed = Seq(
      ("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 1L), ("2024-1-2", 2L)).toDF("day", "uid")
    val m = Graft.retentionCurves(mixed, col("day"), col("uid"), 1)
      .sort("cohort", "offset").collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    assert(m == Seq(
      ("2024-01-01", 0L, 2L, 2L), ("2024-01-01", 1L, 2L, 2L),
      ("2024-01-02", 0L, 2L, 2L), ("2024-01-02", 1L, 2L, 0L)))
  }

  test("README quick-start composition runs end to end") {
    val docs = Seq(
      (1L, "web", "en", 30L, "alpha beta gamma delta epsilon zeta"),
      (2L, "web", "en", 30L, "alpha beta gamma delta epsilon zeta"),
      (3L, "book", "fr", 20L, "le chat et la table et les mots"),
      (4L, "book", "es", 25L, "texto completamente distinto de los otros")
    ).toDF("doc_id", "source", "lang", "n_chars", "text")
    val clusters = Graft.nearDupClusters(docs)
    val keepers = docs
      .join(clusters, col("doc_id") === col("id"), "left")
      .filter(col("label").isNull || col("doc_id") === col("label"))
    assert(keepers.count() == 3) // 1≡2 collapse, 3 and 4 are singletons
    val chunks = Graft.chunks(keepers)
    assert(chunks.count() > 0)
    val splits = Graft.hashSplit(keepers, col("doc_id"))
    assert(splits.count() == keepers.count())
    val stats = Graft.tableStats(docs, Seq("doc_id", "source", "lang"))
    assert(stats.count() == 3)
    val facts = Seq((1L, 10L), (2L, 99L)).toDF("fact_id", "dim_id")
    val dims = Seq((10L, "d")).toDF("id", "name")
    val dq = Graft.refIntegrityAudit("facts->dims", facts, "dim_id",
      dims, "id").head
    assert(dq.getLong(3) == 1L) // the 99 orphan
    val sk = docs.agg(Graft.hll(col("doc_id")), Graft.cms(col("lang")),
      Graft.histogram(col("n_chars").cast("double"))).head
    assert(!sk.isNullAt(0) && !sk.isNullAt(1) && !sk.isNullAt(2))
  }

  test("repetitionSignals computes dup fractions on user frames") {
    val docs = Seq(
      (1L, "a a a a a a"),
      (2L, "all words here are unique tokens")
    ).toDF("doc_id", "text")
    val r = Graft.repetitionSignals(docs).collect()
      .map(x => x.getLong(0) -> (x.getDouble(3), x.getLong(4))).toMap
    assert(r(1L)._1 > 0.8 && r(1L)._2 == 5) // "a a" bigram 5 times
    assert(r(2L)._1 == 0.0 && r(2L)._2 == 1)
  }

  test("pcaTopComponent runs on an arbitrary embedding frame") {
    val em = Seq(
      (1L, Array(2.0, 0.1, 0.0)), (2L, Array(-2.0, -0.1, 0.0)),
      (3L, Array(1.5, 0.0, 0.1)), (4L, Array(-1.5, 0.0, -0.1)),
      (5L, Array(1.8, 0.05, 0.02))
    ).toDF("vec_id", "emb")
    val v = Graft.pcaTopComponent(em).orderBy("dim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v.size == 3)
    // the variance is overwhelmingly along dim 1
    assert(math.abs(v(1L)) == 1.0, s"dominant loading was ${v(1L)}")
    assert(math.abs(v(2L)) < 0.2 && math.abs(v(3L)) < 0.2)
  }

  test("ivfpqEncode codes an arbitrary 64-dim frame deterministically") {
    val em = (0L until 60L).map { i =>
      (i, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13).toDouble / 13.0))
    }.toDF("vec_id", "emb")
    val codes = Graft.ivfpqEncode(em)
    assert(codes.count() == 60)
    // one row per vector; cells come from the frame's centroid scheme
    // (vec_id % 50 == 0 → ids 0 and 50); codes point into the codebook
    assert(codes.select("vec_id").distinct().count() == 60)
    assert(codes.filter(!col("c_id").isin(0L, 50L)).count() == 0)
    val codeCols = codes.columns.filter(_.startsWith("code"))
    assert(codeCols.length == graft.operators.VectorOps.pqSubspaces)
    codeCols.foreach { c =>
      assert(codes.filter(col(c) < 0 || col(c) >= 60).count() == 0) }
    // deterministic: a second build is row-identical
    val again = Graft.ivfpqEncode(em)
    assert(codes.exceptAll(again).count() == 0 &&
      again.exceptAll(codes).count() == 0)
  }

  test("facade entry points degrade gracefully on empty inputs") {
    val noDocs = corpus.filter(col("doc_id") < 0)
    assert(Graft.nearDupPairs(noDocs).count() == 0)
    assert(Graft.nearDupClusters(noDocs).count() == 0)
    assert(Graft.chunks(noDocs).count() == 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Graft.componentLabels(noPairs).count() == 0)
    assert(Graft.contamination(noDocs, corpus).count() == 0)
  }

  test("cosine and tokenizers compose on user frames") {
    val v = Seq((Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")
    val cs = v.select(Graft.cosine(col("a"), col("b"))).collect()
      .map(_.getDouble(0)).toSeq
    assert(cs == Seq(1.0, 0.0))
    val toks = Seq("hello spark 你好世界").toDF("text")
      .select(Graft.cjkTokens(col("text")).as("t")).head.getSeq[String](0)
    assert(toks.contains("hello") && toks.contains("你好"))
  }

  test("repetitionGate flags a degenerate doc and passes varied text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "each word here appears exactly once in this sentence")
    ).toDF("doc_id", "text")
    val r = Graft.repetitionGate(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1: one token repeated 10x -> top share 1.0, all grams dup
    assert(r(1L).getAs[Long]("top_tok_ct") == 10L)
    assert(r(1L).getAs[Long]("dup2_ct") == 8L)
    assert(r(1L).getAs[Boolean]("flagged"))
    // doc 2: 9 distinct tokens, zero duplicate grams
    assert(r(2L).getAs[Long]("top_tok_ct") == 1L)
    assert(r(2L).getAs[Long]("dup2_ct") == 0L)
    assert(!r(2L).getAs[Boolean]("flagged"))
  }

  test("vocabCoverage counts OOV mass against the top-N vocab") {
    val docs = Seq(
      ("a", "common common common rare1"),
      ("b", "common common rare2 rare3")
    ).toDF("source", "text")
    // vocab of 1 = {common}; a has 1/4 OOV, b has 2/4
    val r = Graft.vocabCoverage(docs, vocabSize = 1).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("oov_ct") == 1L)
    assert(r("b").getAs[Long]("oov_ct") == 2L)
    assert(r("b").getAs[Long]("oov_distinct_ct") == 2L)
    assert(r("a").getAs[Double]("oov_rate") == 0.25)
  }

  test("clusterAwareSplit keeps planted near-dups in one split, across sources") {
    val r = Graft.clusterAwareSplit(corpus, threshold = 0.7)
    assert(r.count() == corpus.count())
    val by = r.collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // docs 1 and 2 are the near-dup pair: same label, same split
    assert(by(1L).getAs[Long]("cluster_label") ==
      by(2L).getAs[Long]("cluster_label"))
    assert(by(1L).getAs[String]("split") == by(2L).getAs[String]("split"))
    // doc 4 is byte-identical to doc 1 but in ANOTHER source: split
    // leakage is corpus-wide, so the split pairing ignores the source
    // blocking (unlike nearDupPairs above, where source is the LSH
    // blocking key) and 4 must ride with 1's cluster
    assert(by(4L).getAs[Long]("cluster_label") ==
      by(1L).getAs[Long]("cluster_label"))
    assert(by(4L).getAs[String]("split") == by(1L).getAs[String]("split"))
    // singletons label themselves
    assert(by(3L).getAs[Long]("cluster_label") == 3L)
  }

  test("gapFillLocf renders every calendar day and carries the last observation") {
    val daily = Seq(
      ("a", "2024-03-01", BigDecimal("10.00")),
      ("a", "2024-03-04", BigDecimal("40.00")),
      ("b", "2024-03-02", BigDecimal("7.00")))
      .toDF("g", "d", "amt")
      .select(col("g"), to_date(col("d")).as("d"),
        col("amt").cast("decimal(18,2)").as("amt"))
    val r = Graft.gapFillLocf(daily).collect()
      .map(x => (x.getString(0), x.getString(1), x.getBoolean(2),
        x.getDouble(3), x.getDouble(4))).sortBy(t => (t._1, t._2))
    // spine = 4 days × 2 groups
    assert(r.length == 8)
    assert(r.filter(_._3).length == 3)
    // series a: 10 observed, carried through the gap, then 40
    val a = r.filter(_._1 == "a").map(t => (t._4, t._5)).toSeq
    assert(a == Seq((10.0, 10.0), (0.0, 10.0), (0.0, 10.0), (40.0, 40.0)))
    // series b: zero before first observation, then carried 7s
    val b = r.filter(_._1 == "b").map(t => (t._4, t._5)).toSeq
    assert(b == Seq((0.0, 0.0), (7.0, 7.0), (0.0, 7.0), (0.0, 7.0)))
  }

  test("maintainRollup delta stream equals the snapshot recompute, group moves included") {
    // key 1: insert in g0, update MOVES it to g1 (retract g0, assert g1)
    // key 2: insert then delete (nets out entirely)
    // key 3: plain insert in g1
    val ops = Seq(
      (1L, false, 0L, BigDecimal("5.00"), 1),
      (1L, false, 1L, BigDecimal("6.00"), 2),
      (2L, false, 0L, BigDecimal("9.00"), 1),
      (2L, true, 0L, BigDecimal("9.00"), 2),
      (3L, false, 1L, BigDecimal("4.00"), 1))
      .toDF("id", "is_del", "g", "v", "seq")
      .select(col("id"), col("is_del"), col("g"),
        col("v").cast("decimal(18,2)").as("v"), col("seq"))
    val r = Graft.maintainRollup(ops, Seq(col("seq"))).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getLong(2))).toMap
    // g0 has no live keys (key 1 moved away, key 2 deleted) -> absent
    assert(!r.contains(0L), r.toString)
    assert(r(1L) == (10.0, 2L), r.toString)
  }

  test("burstiness separates periodic from bursty repetition") {
    val docs = Seq(
      // 'a' and 'x' recur at constant stride: zero gap variance, B = -1
      (1L, "periodic", "a x a x a x a x a"),
      // 'b' recurs in two clumps (gaps {1,1,10,1}: sigma > mu, B > 0);
      // the fillers are all distinct so only 'b' qualifies
      (2L, "bursty", "b b b y1 y2 y3 y4 y5 y6 y7 y8 y9 b b")
    ).toDF("doc_id", "lang", "text")
    val r = Graft.burstiness(docs).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2))).toMap
    assert(r("periodic")._2 == -1.0, s"constant gaps must score -1: $r")
    assert(r("bursty")._1 == 1L, s"only 'b' repeats 3+ times: $r")
    assert(r("bursty")._2 > 0.0, s"clumped gaps must score positive: $r")
  }

  test("saltedAgg switches plans on skew and keeps results identical") {
    // hot input: one key owns ~90% of rows (skew factor >> 4); uniform
    // input: every key carries the same count (factor = 1)
    val hot = (1 to 2000).map { i =>
      (if (i <= 1800) "hotkey" else s"k${i % 20}", i.toLong)
    }.toDF("k", "v").select(col("k"),
      col("v").cast("decimal(18,2)").as("v"))
    val uniform = (1 to 2000).map(i => (s"k${i % 20}", i.toLong))
      .toDF("k", "v").select(col("k"),
        col("v").cast("decimal(18,2)").as("v"))
    val aggs = Seq(
      ("n", "count", lit(1)), ("total", "sum", col("v")),
      ("lo", "min", col("v")), ("hi", "max", col("v")))
    val hotPlan = Graft.saltedAgg(hot, Seq("k"), aggs)
    val uniPlan = Graft.saltedAgg(uniform, Seq("k"), aggs)
    // plan switch: the salted form pays a second Exchange (salted
    // partial -> final merge); the plain form aggregates in one
    assert(PlanBudget.shuffleCount(
      hotPlan.queryExecution.executedPlan.toString) == 2,
      "hot input must plan the two-phase salted aggregate")
    assert(PlanBudget.shuffleCount(
      uniPlan.queryExecution.executedPlan.toString) == 1,
      "uniform input must plan the plain aggregate")
    // schema parity: the salted sums cast back to the one-pass types
    val plain = hot.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(col("v")).as("total"), min(col("v")).as("lo"),
      max(col("v")).as("hi"))
    // names + types (nullability legitimately differs: a one-pass count
    // is provably non-null, a merged partial is not)
    assert(hotPlan.schema.map(f => f.name -> f.dataType) ==
      plain.schema.map(f => f.name -> f.dataType),
      s"${hotPlan.schema} vs ${plain.schema}")
    // value parity on both routes
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getDecimal(3), r.getDecimal(4)))
      .toMap
    assert(m(hotPlan) == m(plain))
    assert(m(uniPlan) == m(uniform.groupBy(col("k")).agg(
      count(lit(1)).as("n"), sum(col("v")).as("total"),
      min(col("v")).as("lo"), max(col("v")).as("hi"))))
  }

  test("applyLayout: bucket mode writes the planned file count, " +
      "range mode's extents never overlap") {
    val df = spark.range(0, 4000).select(col("id").as("k"),
      concat(lit("payload_"), col("id")).as("v"))
    val est = lit(64L) // 4000 × 64 B at an 32 KiB target → 8 partitions
    val outB = java.nio.file.Files.createTempDirectory("layout_b").toString
    val nB = Graft.applyLayout(df, col("k"), est, 32768L, outB, "bucket")
    assert(nB == 8, s"plan arithmetic: got $nB partitions")
    def partFiles(dir: String) =
      new java.io.File(dir).listFiles().toSeq
        .filter(f => f.getName.startsWith("part-"))
    assert(partFiles(outB).size == nB,
      "bucket mode must write one file per planned partition")
    // written bytes are balanced — no degenerate bucket
    val sizes = partFiles(outB).map(_.length())
    assert(sizes.max < 3 * sizes.min,
      s"bucket sizes degenerate: ${sizes.sorted.mkString(",")}")
    // range mode: per-file key extents are disjoint → footer stats
    // prune range scans (the x8 win, applied)
    val outR = java.nio.file.Files.createTempDirectory("layout_r").toString
    val nR = Graft.applyLayout(df, col("k"), est, 32768L, outR, "range")
    val extents = partFiles(outR).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(extents.size == nR)
    extents.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"range extents overlap: $extents")
      case _ => ()
    }
    // and the layout is a pure re-arrangement — nothing lost
    assert(spark.read.parquet(outR).count() == 4000 &&
      spark.read.parquet(outB).count() == 4000)
    // degenerate key (one value): hash layout lands everything in one
    // partition; the other planned partitions are empty and write no
    // file — the documented file-count <= plan contract, not a failure
    val skewed = spark.range(0, 4000).select(lit(7L).as("k"),
      concat(lit("payload_"), col("id")).as("v"))
    val outS = java.nio.file.Files.createTempDirectory("layout_s").toString
    val nS = Graft.applyLayout(skewed, col("k"), est, 32768L, outS, "bucket")
    assert(nS == 8, s"plan arithmetic is data-size-only: got $nS")
    val skewFiles = partFiles(outS)
    assert(skewFiles.size <= nS && skewFiles.nonEmpty,
      s"degenerate key wrote ${skewFiles.size} files (plan $nS)")
    assert(spark.read.parquet(outS).count() == 4000)
    // a caller-cached frame keeps ITS cache (CacheManager uncaches by
    // plan — applyLayout must only drop a persist it created itself)
    val mine = df.persist()
    mine.count()
    val outC = java.nio.file.Files.createTempDirectory("layout_c").toString
    Graft.applyLayout(mine, col("k"), est, 32768L, outC, "bucket")
    assert(mine.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "applyLayout evicted the caller's own cache")
    mine.unpersist()
    ()
  }

  test("dpReleasedCounts: production draw has the Laplace scale; " +
      "replayable draw replays") {
    // 4000 categories → 4000 independent noise draws; for Laplace(b),
    // E|noise| = b — the mechanism audit the seeded oracle can't do
    val cats = spark.range(0, 4000)
      .select(concat(lit("cat_"), col("id")).as("c"))
    val eps = 0.5 // b = 2.0
    val prod = Graft.dpReleasedCounts(cats, col("c"), epsilon = eps,
      replayable = false)
    assert(prod.count() == 4000)
    val meanAbs = prod
      .agg(avg(abs(col("released_ct") - col("true_ct")))).head.getDouble(0)
    val b = 1.0 / eps
    // SE of mean|X| over 4000 draws ≈ b/63 — ±15% is > 9 sigma
    assert(math.abs(meanAbs - b) < 0.15 * b,
      f"Laplace scale off: E|noise|=$meanAbs%.3f, want ≈ $b%.1f")
    // noise is actually random across categories (not a constant)
    val distinctNoise = prod.select(col("noise")).distinct().count()
    assert(distinctNoise > 3900, s"draws collide: $distinctNoise distinct")
    // the replayable mode is deterministic run to run (the oracle
    // contract) and carries the same scale metadata
    val r1 = Graft.dpReleasedCounts(cats, col("c"), epsilon = eps,
      replayable = true)
    val r2 = Graft.dpReleasedCounts(cats, col("c"), epsilon = eps,
      replayable = true)
    assert(r1.exceptAll(r2).count() == 0 && r2.exceptAll(r1).count() == 0)
    assert(r1.select(col("laplace_scale")).distinct().head.getDouble(0)
      == b)
  }

  test("zscoreAnomalies scores a user series and flags the spike") {
    val daily = (1 to 40).map { i =>
      val amt = if (i == 35) BigDecimal("900.00") else BigDecimal("100.00")
      (f"2024-01-$i%02d", amt)
    }.toDF("cur_date", "amt")
      .select(col("cur_date"),
        col("amt").cast("decimal(18,2)").as("amt"))
    val r = Graft.zscoreAnomalies(daily)
    assert(r.count() == 40)
    val flagged = r.filter(col("anomaly")).collect()
    assert(flagged.length == 1 && flagged.head.getString(0).endsWith("35"))
    // constant stretches score zero
    assert(r.filter(col("cur_date") < "2024-01-35")
      .filter(col("z") =!= 0.0).count() == 0)
  }

  test("materializeSummary + navigate serve a user fact table") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_api_nav_").toString
    try {
      (1 to 200).map { i =>
        (i.toLong, f"2024-01-${i % 5 + 1}%02d",
          if (i % 3 == 0) "gold" else "std", i * 1.5)
      }.toDF("id", "day", "tier", "amt")
        .write.mode("overwrite").parquet(s"$base/facts")
      val facts = spark.read.parquet(s"$base/facts")
      // sum derivation is EXACT-types-only: the money measure goes
      // through a DECIMAL cast (a raw double sum would re-order FP
      // addition under re-aggregation and must fall through — asserted
      // below)
      val amt = col("amt").cast("decimal(18,2)")
      Graft.materializeSummary("api_nav", facts,
        keys = Seq("day" -> col("day"), "tier" -> col("tier")),
        measures = Seq(("amt_sum", "sum", amt),
          ("n", "count_star", lit(1))),
        path = s"$base/summary")
      val raw = facts.filter(col("tier") === "gold")
        .groupBy(col("day"))
        .agg(sum(amt).as("amt_sum"), count(lit(1)).as("n"))
      val nav = Graft.navigate(raw)
      // the rewritten plan reads the summary, not the facts
      val leaves = nav.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
        case _ => Nil
      }
      assert(leaves.exists(_.contains("summary")) &&
        !leaves.exists(_.contains("facts")),
        s"navigate did not swap the scan: $leaves")
      val a = raw.sort("day").collect().toSeq
      val b = nav.sort("day").collect().toSeq
      assert(a == b)
      // the float-sum shape is NOT navigable (exact-types-only policy)
      val floatSum = Graft.navigate(
        facts.groupBy(col("day")).agg(sum(col("amt")).as("s")))
      val floatLeaves = floatSum.queryExecution.optimizedPlan
        .collectLeaves().flatMap {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
          case _ => Nil
        }
      assert(floatLeaves.exists(_.contains("facts")),
        s"double sum must fall through to raw: $floatLeaves")
    } finally {
      graft.plans.AggRewrite.unregister(spark, "api_nav")
      def rm0(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm0)
        f.delete()
      }
      rm0(new java.io.File(base))
    }
  }

  test("refreshSummaryPartitions refreshes only the touched partition") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_api_refresh_").toString
    try {
      Seq((1L, "p1", 2.0), (2L, "p1", 3.0), (3L, "p2", 5.0))
        .toDF("id", "part", "amt")
        .write.mode("overwrite").parquet(s"$base/facts")
      def facts = spark.read.parquet(s"$base/facts")
      val amt = col("amt").cast("decimal(18,2)") // exact-types-only sums
      Graft.materializeSummary("api_refresh", facts,
        keys = Seq("part" -> col("part")),
        measures = Seq(("amt_sum", "sum", amt),
          ("n", "count_star", lit(1))),
        path = s"$base/summary", partitionBy = Some("part"))
      Seq((4L, "p2", 7.0)).toDF("id", "part", "amt")
        .write.mode("append").parquet(s"$base/facts")
      Graft.refreshSummaryPartitions("api_refresh", facts, Seq("p2"))
      val nav = Graft.navigate(facts.groupBy(col("part"))
        .agg(count(lit(1)).as("n"), sum(amt).cast("double").as("s")))
      val leaves2 = nav.queryExecution.optimizedPlan.collectLeaves()
        .flatMap {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
          case _ => Nil
        }
      assert(leaves2.exists(_.contains("summary")),
        s"refresh did not resume navigation: $leaves2")
      val p2 = nav.filter(col("part") === "p2").head
      assert(p2.getLong(1) == 2L && p2.getDouble(2) == 12.0)
    } finally {
      graft.plans.AggRewrite.unregister(spark, "api_refresh")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }
}
