package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}

/** Corpus-quality operators a training-data pipeline runs before any
  * model sees a byte: PII detection/redaction (the scrub pass) and
  * C4/Gopher-style repetition signals (the quality-filter features).
  * Beyond-reference scope, same engine idioms as [[TextOps]]: every
  * scalar stage is codegen'd builtins (regexp_* / split / higher-order
  * array functions), map-side until the final aggregation.
  *
  * Scale notes: p15 is a pure map + one small groupBy(lang) — at 100 TB
  * the redaction pass is embarrassingly parallel and the aggregate is
  * bounded by the language count. t10's only shuffles are keyed on
  * doc_id (bigram counting), the natural partitioning of a document
  * corpus; no all-pairs, no driver-side state.
  */
object QualityOps extends QueryModule {

  /** Shared Java/RE2-safe PII patterns (both engines compile them
    * identically — no lookaround, no backrefs). */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat = "\\+1-555-[0-9]+"
  val ipPat = "192\\.168\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Deterministic PII-bearing fixture: the synthetic corpus carries no
    * real PII, so the queries plant addresses/numbers derived from
    * doc_id (both engines build the identical string). */
  private def withPii(c: Column): Column = {
    val email = concat(lit(" Contact user"),
      col("doc_id").cast(StringType), lit("@example.com now"))
    val phone = concat(lit(" call +1-555-"),
      (col("doc_id") % 10000).cast(StringType))
    val ip = concat(lit(" from 192.168."),
      (col("doc_id") % 256).cast(StringType), lit("."),
      (col("doc_id") % 100).cast(StringType))
    concat(c,
      when(col("doc_id") % 3 === 0, email).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, phone).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, ip).otherwise(lit("")))
  }

  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPat, "<EMAIL>"),
        phonePat, "<PHONE>"),
      ipPat, "<IP>")

  /** p19 (beyond-reference): k-anonymity release audit — the privacy
    * gate next to p15's PII scrub: even after direct identifiers are
    * redacted, a row is re-identifiable when its QUASI-identifier
    * combination is shared by too few users (Sweeney's k-anonymity).
    * Equivalence classes here are (event_type, epoch-week, value
    * decile-bucket); per event_type the report states class count,
    * the smallest class's distinct-user size, how many classes fall
    * below k = [[kAnon]], the record mass they expose, and the
    * go/no-go flag (k_anonymous = every class ≥ k). This is the table
    * a release review reads to decide between publishing, coarsening
    * the buckets, or suppressing the risky sliver. Scale shape: one
    * map-side-combinable class aggregation keyed by the quasi-id tuple
    * (bounded by the id-space cross product, not by rows) + one
    * event_type rollup; integer week/bucket math is engine-exact. */
  val kAnon = 5

  /** Generic class-level core behind p19 and [[graft.api.Graft
    * .kAnonymityClasses]]: one row per distinct quasi-identifier tuple
    * with its distinct-subject count and record mass. */
  private[graft] def kAnonClasses(df: DataFrame, qiCols: Seq[Column],
      subject: Column): DataFrame =
    df.groupBy(qiCols: _*)
      .agg(countDistinct(subject).as("class_users"),
        count(lit(1)).as("rec_ct"))

  private def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Fns
    val weekUs = 7L * 86400L * 1000000L
    kAnonClasses(
      Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          Fns.divFloor(Fns.nsToUs(col("ts")), weekUs).as("wk"),
          floor(col("value") / lit(10.0)).cast(LongType).as("vb")),
      Seq(col("event_type"), col("wk"), col("vb")), col("user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("class_ct"),
        min(col("class_users")).as("min_class_users"),
        sum(when(col("class_users") < kAnon, 1L).otherwise(0L))
          .as("risky_class_ct"),
        sum(when(col("class_users") < kAnon, col("rec_ct")).otherwise(0L))
          .as("risky_rec_ct"))
      .withColumn("k_anonymous", col("min_class_users") >= kAnon)
  }

  /** p20 (beyond-reference): l-diversity audit — k-anonymity's (p19)
    * blind spot: a class can hold ≥k subjects yet expose them all if
    * every record shares one sensitive value. Same quasi-identifier
    * grid as p19 minus the audited attribute; sensitive value =
    * event_type; a class is risky when it carries fewer than l=3
    * distinct sensitive values. Reported per week so a release gate
    * can cut only the offending partitions. Same one-shuffle shape as
    * p19 (class rollup → week rollup). */
  val lDiv = 3

  private def lDiversity(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Fns
    val weekUs = 7L * 86400L * 1000000L
    Tables(s, dir, "events")
      .select(Fns.divFloor(Fns.nsToUs(col("ts")), weekUs).as("wk"),
        floor(col("value") / lit(10.0)).cast(LongType).as("vb"),
        col("event_type"))
      .groupBy(col("wk"), col("vb"))
      .agg(countDistinct(col("event_type")).as("l_values"),
        count(lit(1)).as("rec_ct"))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("class_ct"),
        min(col("l_values")).as("min_l"),
        sum(when(col("l_values") < lDiv, 1L).otherwise(0L))
          .as("risky_class_ct"),
        sum(when(col("l_values") < lDiv, col("rec_ct")).otherwise(0L))
          .as("risky_rec_ct"))
      .withColumn("l_diverse", col("min_l") >= lDiv)
  }

  /** p21 (beyond-reference): differentially-private released counts —
    * the publication form of a per-category histogram: count + Laplace
    * noise at sensitivity 1, ε = 1. The draw is SEEDED from the
    * category key (inverse-CDF over the shared md5-uniform
    * [[graft.functions.Fns.hex4]]), so the release is reproducible and
    * the DuckDB oracle replays the exact noise — a real deploy swaps
    * the seed source for a calibrated RNG; the mechanism (scale, the
    * inverse-CDF transform, post-processing rounding) is the audited
    * part. Map-side-combinable count, O(categories) output. */
  val dpEpsilon = 1.0

  /** Shared Laplace release core: per distinct key, the true count plus
    * Laplace(1/ε) noise via the inverse-CDF transform over a uniform
    * draw. Two draw sources behind one facade
    * ([[graft.api.Graft.dpReleasedCounts]]):
    *  - `replayable = true` — the md5-seeded uniform ([[Fns.hex4]] of
    *    the key), reproducible and DuckDB-replayable: the AUDIT mode
    *    (mechanism, scale, post-processing are the verified part);
    *  - `replayable = false` — the PRODUCTION draw: Spark's `rand(seed)`
    *    (XORShiftRandom seeded per partition), the calibrated RNG a real
    *    release must use, spec-proven to have the Laplace(b) shape
    *    (E|X| = b) rather than replay-compared. The uniform is clamped
    *    away from the log(0) pole at u ∈ {0, 1}. */
  private[graft] def dpCountsFor(df: org.apache.spark.sql.DataFrame,
      key: Column, epsilon: Double, replayable: Boolean,
      seed: Long = 2024L): org.apache.spark.sql.DataFrame = {
    require(epsilon > 0, s"dp epsilon must be > 0 (got $epsilon)")
    import graft.functions.Fns
    val b = 1.0 / epsilon
    val u =
      if (replayable)
        (Fns.hex4(concat(lit("dp#"), col("category")))
          .cast(DoubleType) + lit(0.5)) / lit(65536.0)
      else rand(seed)
    val centered = u - lit(0.5)
    val noise = lit(-b) * signum(centered) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(centered)))
    df.groupBy(key.as("category"))
      .agg(count(lit(1)).as("true_ct"))
      .select(col("category"), col("true_ct"),
        round(noise, 6).as("noise"),
        round(col("true_ct") + noise, 6).as("released_ct"),
        lit(b).as("laplace_scale"))
  }

  private def dpCounts(s: SparkSession, dir: String): DataFrame =
    dpCountsFor(Tables(s, dir, "events"), col("event_type"), dpEpsilon,
      replayable = true)
      .withColumnRenamed("category", "event_type")

  /** p22 (beyond-reference): generalization ladder — the FIX for the
    * risky classes p19/p20 flag (the k9→k10 audit→repair pattern
    * applied to privacy): coarsen the value-bucket quasi-identifier
    * through widths 10 → 50 → 250 and report, per rung, how many
    * classes and records remain re-identifiable; the release picks the
    * first rung whose k_anonymous flag is true (suppression only if
    * none is). Scale shape: ONE dedup shuffle builds the compact
    * (type, week, finest-bucket, user) frame with additive record
    * counts; each rung re-aggregates THAT frame (distinct users must be
    * recounted per coarser class — a user spanning two fine buckets
    * collapses into one — but record counts roll up additively), so
    * events are scanned once regardless of ladder depth. */
  val genWidths = Seq(10L, 50L, 250L)

  private def generalizationLadder(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.functions.Fns
    val weekUs = 7L * 86400L * 1000000L
    val base = Tables(s, dir, "events")
      .select(col("event_type"),
        Fns.divFloor(Fns.nsToUs(col("ts")), weekUs).as("wk"),
        floor(col("value") / lit(10.0)).cast(LongType).as("vb10"),
        col("user_id"))
      .groupBy(col("event_type"), col("wk"), col("vb10"), col("user_id"))
      .agg(count(lit(1)).as("rec_ct"))
    genWidths.map { width =>
      // floor division composes (width is a multiple of 10), so
      // floor(value/width) == floor(vb10*10/width) — floor(), not a
      // truncating cast, so negative values stay on the floor grid
      val vbw = floor(col("vb10").cast(DoubleType) * 10.0 / width)
        .cast(LongType)
      base
        .groupBy(col("event_type"), col("wk"), vbw.as("vbw"))
        .agg(countDistinct(col("user_id")).as("class_users"),
          sum(col("rec_ct")).as("rec_ct"))
        .agg(count(lit(1)).as("class_ct"),
          min(col("class_users")).as("min_class_users"),
          sum(when(col("class_users") < kAnon, 1L).otherwise(0L))
            .as("risky_class_ct"),
          sum(when(col("class_users") < kAnon, col("rec_ct"))
            .otherwise(0L)).as("risky_rec_ct"))
        .select(lit(width).as("bucket_width"), col("class_ct"),
          col("min_class_users"), col("risky_class_ct"),
          col("risky_rec_ct"),
          (col("min_class_users") >= kAnon).as("k_anonymous"))
    }.reduce(_ unionByName _)
  }

  /** p15: the PII scrub pass summarized per language — match counts per
    * category and the net characters removed by redaction. */
  private def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), withPii(col("text")).as("txt"))
    d.select(col("lang"),
        size(regexp_extract_all(col("txt"), lit(emailPat), lit(0)))
          .as("email"),
        size(regexp_extract_all(col("txt"), lit(phonePat), lit(0)))
          .as("phone"),
        size(regexp_extract_all(col("txt"), lit(ipPat), lit(0))).as("ip"),
        (length(col("txt")) - length(redact(col("txt")))).as("removed"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("doc_ct"),
        sum(col("email")).cast(LongType).as("email_ct"),
        sum(col("phone")).cast(LongType).as("phone_ct"),
        sum(col("ip")).cast(LongType).as("ip_ct"),
        sum(col("removed")).cast(LongType).as("removed_chars"))
  }

  /** t10: per-document repetition signals (C4/Gopher quality features):
    * duplicate-token fraction and the top bigram's occurrence count.
    * Bigrams are built row-wise with one single-level transform over the
    * token array (element_at indexing — no nested array lambdas, the t9
    * collapse lesson), then counted through two doc_id-keyed
    * aggregations. */
  private def repetitionSignals(s: SparkSession, dir: String): DataFrame =
    repetitionSignalsFor(Tables(s, dir, "documents"))

  /** Generic per-document repetition signals for an arbitrary
    * (doc_id, text) frame — the t10 core behind [[graft.api.Graft]]. */
  private[graft] def repetitionSignalsFor(docs: DataFrame): DataFrame = {
    val toks = filter(TextOps.tokenize(lower(col("text"))), t => t =!= "")
    val d = docs
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
    val base = d.select(col("doc_id"),
      size(col("t")).cast(LongType).as("n_tokens"),
      size(array_distinct(col("t"))).cast(LongType).as("n_distinct"))
    val bigrams = when(size(col("t")) >= 2,
      transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", element_at(col("t"), i),
          element_at(col("t"), i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    val top = d.select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("ct"))
      .groupBy(col("doc_id"))
      .agg(max(col("ct")).as("top_ct"))
      .withColumnRenamed("doc_id", "b_doc_id")
    base.join(top, col("doc_id") === col("b_doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round((col("n_tokens") - col("n_distinct")).cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 6).as("dup_frac"),
        coalesce(col("top_ct"), lit(0L)).as("top_bigram_ct"))
  }

  /** c8: the quality-filter funnel audit — every corpus pipeline ships
    * one: per source, how many documents survive each cumulative gate
    * (length → repetition → PII-clean). ONE scan computes all signals
    * (token counts, dup fraction, PII matches over the planted fixture)
    * and one groupBy emits the wide funnel row; at 100 TB this is a
    * map-side pass plus an aggregation bounded by the source count. */
  private def qualityFunnel(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(TextOps.tokenize(lower(col("text"))), t => t =!= "")
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        withPii(col("text")).as("txt"), toks.as("t"))
      .select(col("source"),
        size(col("t")).as("n_tokens"),
        size(array_distinct(col("t"))).as("n_distinct"),
        col("n_chars"),
        (size(regexp_extract_all(col("txt"), lit(emailPat), lit(0))) +
          size(regexp_extract_all(col("txt"), lit(phonePat), lit(0))) +
          size(regexp_extract_all(col("txt"), lit(ipPat), lit(0))))
          .as("pii_ct"))
    val lenOk = col("n_tokens") >= 10 && col("n_chars") <= 20000
    val repOk = lenOk &&
      (col("n_tokens") - col("n_distinct")).cast("double") /
        col("n_tokens").cast("double") <= 0.5
    val cleanOk = repOk && col("pii_ct") === 0
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("total_ct"),
        sum(when(lenOk, 1L).otherwise(0L)).as("len_ok_ct"),
        sum(when(repOk, 1L).otherwise(0L)).as("rep_ok_ct"),
        sum(when(cleanOk, 1L).otherwise(0L)).as("clean_ct"))
  }

  /** c9: training-sequence packing (the GPT-style concat-and-chunk): per
    * source, documents are laid end to end in a deterministic md5 order
    * (the c7 stable-shuffle idiom — identical layout on any re-run or
    * re-shard) and cut into fixed 2048-token sequences. One window
    * cumulative sum gives every document its byte range; the audit row
    * reports sequences produced, boundary-spanning documents, and the
    * fill rate. At 100 TB: one shuffle on source, one window pass — no
    * driver-side packing loop. */
  private def sequencePacking(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val SEQ = 2048L
    val toks = filter(TextOps.tokenize(lower(col("text"))), t => t =!= "")
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(toks).cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("k", md5(col("doc_id").cast(StringType)))
    val w = Window.partitionBy(col("source")).orderBy(col("k"), col("doc_id"))
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("first_seq", expr(s"(cum - n_tokens) div $SEQ"))
      .withColumn("last_seq", expr(s"(cum - 1) div $SEQ"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("doc_ct"),
        sum(col("n_tokens")).as("token_sum"),
        expr(s"(max(cum) + ${SEQ - 1}) div $SEQ").as("n_sequences"),
        sum(when(col("first_seq") =!= col("last_seq"), 1L).otherwise(0L))
          .as("boundary_docs"))
      .withColumn("fill_rate",
        round(col("token_sum").cast(DoubleType) /
          (col("n_sequences") * SEQ).cast(DoubleType), 6))
  }

  /** p16: URL canonicalization + dedup — the crawl-frontier dedup gate:
    * scheme/host-case noise, `www.` prefixes, tracking parameters
    * (`utm_*`) and fragments all collapse to one canonical form, then
    * exact dedup groups by canonical URL. The synthetic corpus carries
    * no URLs, so (as with p15's PII) each doc plants a deterministic
    * doc_id-derived raw URL — many raw variants per canonical target —
    * and both engines build the identical string. Canonicalization is a
    * pure map (5 regexp/lower steps, all codegen'd); the dedup is one
    * groupBy on the canonical key — at 100 TB this is the frontier
    * "have we crawled this?" pass, shuffling only the URL column. */
  private def urlCanonicalize(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val raw = concat(
      when(id % 2 === 0, "https://").otherwise("HTTP://"),
      when(id % 3 === 0, "WWW.Example.COM")
        .when(id % 3 === 1, "example.com").otherwise("Example.Com"),
      lit("/p/"), (id % 40).cast(StringType),
      when(id % 4 === 0,
          concat(lit("?utm_source=feed&ref="), (id % 5).cast(StringType)))
        .when(id % 4 === 1, concat(lit("?ref="), (id % 5).cast(StringType)))
        .otherwise(lit("")),
      when(id % 5 === 0, "#top").otherwise(""))
    val canon =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(lower(raw), "^http://", "https://"),
              "^https://www\\.", "https://"),
            "#.*$", ""),
          "utm_[a-z]+=[^&#]*&?", ""),
        "[?&]$", "")
    Tables(s, dir, "documents")
      .select(col("doc_id"), raw.as("raw_url"), canon.as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("dup_ct"),
        countDistinct(col("raw_url")).as("variant_ct"),
        min(col("doc_id")).as("min_doc"))
  }

  /** p17: tombstone purge — the right-to-be-forgotten pass every stored
    * corpus needs: a deletion-request list (deterministic fixture:
    * doc_id % 101 = 0) is propagated through THREE derived stores (the
    * c13 chunk store, the t5 fingerprint store, the embedding store)
    * and the per-table purge ledger is emitted. Scale shape: the
    * tombstone list broadcasts (it is small by nature) and each derived
    * table pays ONE map-side probe — never a shuffle of the store, and
    * the per-table audit is a 1-row aggregate. The kept rows are
    * exactly `store LEFT ANTI tombstones`; the ledger counts both sides
    * from one left-outer probe so the oracle can restate it as CASE
    * sums. */
  private def tombstonePurge(s: SparkSession, dir: String): DataFrame = {
    val tomb = Tables(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(101L)) === 0)
      .select(col("doc_id").as("t_id"))
    def audit(name: String, df: DataFrame, key: String): DataFrame =
      df.join(broadcast(tomb), col(key) === col("t_id"), "left_outer")
        .agg(count(lit(1)).as("total_ct"),
          sum(when(col("t_id").isNotNull, 1L).otherwise(0L))
            .as("purged_ct"))
        .select(lit(name).as("store"), col("total_ct"), col("purged_ct"),
          (col("total_ct") - col("purged_ct")).as("kept_ct"))
    val chunks = SketchOps.queries("c13_rag_chunks")(s, dir)
    val fps = Tables(s, dir, "documents").select(col("doc_id"))
    val em = Tables(s, dir, "embeddings").select(col("vec_id"))
    audit("chunks", chunks, "doc_id")
      .unionByName(audit("fingerprints", fps, "doc_id"))
      .unionByName(audit("embeddings", em, "vec_id"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "p17_tombstone_purge" -> tombstonePurge,
    "p16_url_canonicalize" -> urlCanonicalize,
    "p15_pii_redact" -> piiRedact,
    "p19_k_anonymity" -> kAnonymity,
    "p20_l_diversity" -> lDiversity,
    "p21_dp_counts" -> dpCounts,
    "p22_generalization_ladder" -> generalizationLadder,
    "c8_quality_funnel" -> qualityFunnel,
    "c9_sequence_packing" -> sequencePacking,
    "t10_repetition_signals" -> repetitionSignals)

  val oracles = Map(
    "p17_tombstone_purge" ->
      s"""WITH d AS (
         |  SELECT doc_id, len(list_filter(string_split(lower(text), ' '),
         |                                 x -> x <> '')) AS n
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id,
         |         CASE WHEN n <= 128 THEN 1
         |              ELSE (n - 128 + 95) // 96 + 1 END AS n_chunks
         |  FROM d WHERE n > 0)
         |SELECT 'chunks' AS store,
         |       CAST(sum(n_chunks) AS BIGINT) AS total_ct,
         |       CAST(coalesce(sum(CASE WHEN doc_id % 101 = 0
         |                          THEN n_chunks END), 0) AS BIGINT)
         |         AS purged_ct,
         |       CAST(sum(n_chunks) -
         |            coalesce(sum(CASE WHEN doc_id % 101 = 0
         |                         THEN n_chunks END), 0) AS BIGINT)
         |         AS kept_ct
         |FROM ch
         |UNION ALL
         |SELECT 'fingerprints', count(*),
         |       count(CASE WHEN doc_id % 101 = 0 THEN 1 END),
         |       count(*) - count(CASE WHEN doc_id % 101 = 0 THEN 1 END)
         |FROM documents
         |UNION ALL
         |SELECT 'embeddings', count(*),
         |       count(CASE WHEN vec_id IN (SELECT doc_id FROM documents
         |                                  WHERE doc_id % 101 = 0)
         |             THEN 1 END),
         |       count(*) - count(CASE WHEN vec_id IN
         |           (SELECT doc_id FROM documents WHERE doc_id % 101 = 0)
         |             THEN 1 END)
         |FROM embeddings""".stripMargin,
    "p16_url_canonicalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM'
        |          WHEN doc_id % 3 = 1 THEN 'example.com'
        |          ELSE 'Example.Com' END) ||
        |    '/p/' || CAST(doc_id % 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 4 = 0
        |            THEN '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)
        |          WHEN doc_id % 4 = 1
        |            THEN '?ref=' || CAST(doc_id % 5 AS VARCHAR)
        |          ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS raw_url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, raw_url,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(lower(raw_url), '^http://', 'https://'),
        |            '^https://www\.', 'https://'),
        |          '#.*$', ''),
        |        'utm_[a-z]+=[^&#]*&?', '', 'g'),
        |      '[?&]$', '') AS canon_url
        |  FROM raw)
        |SELECT canon_url, count(*) AS dup_ct,
        |       count(DISTINCT raw_url) AS variant_ct, min(doc_id) AS min_doc
        |FROM c GROUP BY 1""".stripMargin,
    "p19_k_anonymity" ->
      s"""WITH cls AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 604800000000 AS wk,
        |         CAST(floor(value / 10.0) AS BIGINT) AS vb,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS class_users,
        |         CAST(count(*) AS BIGINT) AS rec_ct
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS class_ct,
        |       CAST(min(class_users) AS BIGINT) AS min_class_users,
        |       CAST(sum(CASE WHEN class_users < $kAnon THEN 1 ELSE 0 END)
        |            AS BIGINT) AS risky_class_ct,
        |       CAST(sum(CASE WHEN class_users < $kAnon
        |                THEN rec_ct ELSE 0 END)
        |            AS BIGINT) AS risky_rec_ct,
        |       min(class_users) >= $kAnon AS k_anonymous
        |FROM cls GROUP BY 1""".stripMargin,
    "p22_generalization_ladder" -> {
      val rung = genWidths.map { w =>
        s"""SELECT CAST($w AS BIGINT) AS bucket_width,
           |       CAST(count(*) AS BIGINT) AS class_ct,
           |       CAST(min(class_users) AS BIGINT) AS min_class_users,
           |       CAST(sum(CASE WHEN class_users < $kAnon THEN 1 ELSE 0
           |                END) AS BIGINT) AS risky_class_ct,
           |       CAST(sum(CASE WHEN class_users < $kAnon THEN rec_ct
           |                ELSE 0 END) AS BIGINT) AS risky_rec_ct,
           |       min(class_users) >= $kAnon AS k_anonymous
           |FROM (
           |  SELECT event_type, wk,
           |         CAST(floor(CAST(vb10 AS DOUBLE) * 10 / $w) AS BIGINT)
           |           AS vbw,
           |         CAST(count(DISTINCT user_id) AS BIGINT)
           |           AS class_users,
           |         CAST(sum(rec_ct) AS BIGINT) AS rec_ct
           |  FROM base GROUP BY 1, 2, 3)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS MATERIALIZED (
         |  SELECT event_type,
         |         epoch_us(ts) // 604800000000 AS wk,
         |         CAST(floor(value / 10.0) AS BIGINT) AS vb10,
         |         user_id, CAST(count(*) AS BIGINT) AS rec_ct
         |  FROM events GROUP BY 1, 2, 3, 4)
         |$rung""".stripMargin
    },
    "p20_l_diversity" ->
      s"""WITH cls AS (
        |  SELECT epoch_us(ts) // 604800000000 AS wk,
        |         CAST(floor(value / 10.0) AS BIGINT) AS vb,
        |         CAST(count(DISTINCT event_type) AS BIGINT) AS l_values,
        |         CAST(count(*) AS BIGINT) AS rec_ct
        |  FROM events GROUP BY 1, 2)
        |SELECT wk,
        |       CAST(count(*) AS BIGINT) AS class_ct,
        |       CAST(min(l_values) AS BIGINT) AS min_l,
        |       CAST(sum(CASE WHEN l_values < $lDiv THEN 1 ELSE 0 END)
        |            AS BIGINT) AS risky_class_ct,
        |       CAST(sum(CASE WHEN l_values < $lDiv
        |                THEN rec_ct ELSE 0 END)
        |            AS BIGINT) AS risky_rec_ct,
        |       min(l_values) >= $lDiv AS l_diverse
        |FROM cls GROUP BY 1""".stripMargin,
    "p21_dp_counts" -> {
      val u = graft.functions.Oracle.hex4("'dp#' || event_type")
      s"""WITH c AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS true_ct
        |  FROM events GROUP BY 1),
        |n AS (
        |  SELECT *, (($u + CAST(0.5 AS DOUBLE)) / CAST(65536.0 AS DOUBLE))
        |              - CAST(0.5 AS DOUBLE) AS ctr
        |  FROM c)
        |SELECT event_type, true_ct,
        |       round(CAST(-1.0 AS DOUBLE) *
        |             (CASE WHEN ctr > 0 THEN CAST(1.0 AS DOUBLE)
        |                   WHEN ctr < 0 THEN CAST(-1.0 AS DOUBLE)
        |                   ELSE CAST(0.0 AS DOUBLE) END) *
        |             ln(CAST(1.0 AS DOUBLE)
        |                - CAST(2.0 AS DOUBLE) * abs(ctr)), 6) AS noise,
        |       round(true_ct + CAST(-1.0 AS DOUBLE) *
        |             (CASE WHEN ctr > 0 THEN CAST(1.0 AS DOUBLE)
        |                   WHEN ctr < 0 THEN CAST(-1.0 AS DOUBLE)
        |                   ELSE CAST(0.0 AS DOUBLE) END) *
        |             ln(CAST(1.0 AS DOUBLE)
        |                - CAST(2.0 AS DOUBLE) * abs(ctr)), 6)
        |         AS released_ct,
        |       CAST(1.0 AS DOUBLE) AS laplace_scale
        |FROM n""".stripMargin
    },
    "p15_pii_redact" -> {
      val fixture =
        """text ||
          |  CASE WHEN doc_id % 3 = 0 THEN ' Contact user' ||
          |    CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
          |  CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' ||
          |    CAST(doc_id % 10000 AS VARCHAR) ELSE '' END ||
          |  CASE WHEN doc_id % 7 = 0 THEN ' from 192.168.' ||
          |    CAST(doc_id % 256 AS VARCHAR) || '.' ||
          |    CAST(doc_id % 100 AS VARCHAR) ELSE '' END""".stripMargin
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-555-[0-9]+"
      val ip = "192\\.168\\.[0-9]{1,3}\\.[0-9]{1,3}"
      s"""WITH d AS (SELECT lang, ($fixture) AS txt FROM documents),
         |m AS (SELECT lang,
         |        len(regexp_extract_all(txt, '$email')) AS email,
         |        len(regexp_extract_all(txt, '$phone')) AS phone,
         |        len(regexp_extract_all(txt, '$ip')) AS ip,
         |        length(txt) - length(
         |          regexp_replace(regexp_replace(regexp_replace(txt,
         |            '$email', '<EMAIL>', 'g'),
         |            '$phone', '<PHONE>', 'g'),
         |            '$ip', '<IP>', 'g')) AS removed
         |      FROM d)
         |SELECT lang, count(*) AS doc_ct,
         |       CAST(SUM(email) AS BIGINT) AS email_ct,
         |       CAST(SUM(phone) AS BIGINT) AS phone_ct,
         |       CAST(SUM(ip) AS BIGINT) AS ip_ct,
         |       CAST(SUM(removed) AS BIGINT) AS removed_chars
         |FROM m GROUP BY 1""".stripMargin
    },
    "c8_quality_funnel" -> {
      val fixture =
        """text ||
          |  CASE WHEN doc_id % 3 = 0 THEN ' Contact user' ||
          |    CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
          |  CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' ||
          |    CAST(doc_id % 10000 AS VARCHAR) ELSE '' END ||
          |  CASE WHEN doc_id % 7 = 0 THEN ' from 192.168.' ||
          |    CAST(doc_id % 256 AS VARCHAR) || '.' ||
          |    CAST(doc_id % 100 AS VARCHAR) ELSE '' END""".stripMargin
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-555-[0-9]+"
      val ip = "192\\.168\\.[0-9]{1,3}\\.[0-9]{1,3}"
      s"""WITH sig AS (
         |  SELECT source, n_chars,
         |         len(list_filter(string_split(lower(text), ' '),
         |                         x -> x <> '')) AS n_tokens,
         |         len(list_distinct(list_filter(
         |             string_split(lower(text), ' '),
         |             x -> x <> ''))) AS n_distinct,
         |         len(regexp_extract_all(($fixture), '$email')) +
         |         len(regexp_extract_all(($fixture), '$phone')) +
         |         len(regexp_extract_all(($fixture), '$ip')) AS pii_ct
         |  FROM documents),
         |g AS (
         |  SELECT source,
         |         (n_tokens >= 10 AND n_chars <= 20000) AS len_ok,
         |         (n_tokens >= 10 AND n_chars <= 20000 AND
         |          (n_tokens - n_distinct) / CAST(n_tokens AS DOUBLE)
         |            <= 0.5) AS rep_ok,
         |         pii_ct
         |  FROM sig)
         |SELECT source, count(*) AS total_ct,
         |       CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT)
         |         AS len_ok_ct,
         |       CAST(SUM(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT)
         |         AS rep_ok_ct,
         |       CAST(SUM(CASE WHEN rep_ok AND pii_ct = 0
         |                THEN 1 ELSE 0 END) AS BIGINT) AS clean_ct
         |FROM g GROUP BY 1""".stripMargin
    },
    "c9_sequence_packing" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(lower(text), ' '),
        |                         x -> x <> '')) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_tokens) OVER
        |    (PARTITION BY source ORDER BY k, doc_id) AS cum
        |  FROM d WHERE n_tokens > 0)
        |SELECT source, count(*) AS doc_ct,
        |       CAST(SUM(n_tokens) AS BIGINT) AS token_sum,
        |       CAST((MAX(cum) + 2047) // 2048 AS BIGINT) AS n_sequences,
        |       CAST(SUM(CASE WHEN (cum - n_tokens) // 2048
        |                       <> (cum - 1) // 2048
        |                THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs,
        |       round(CAST(SUM(n_tokens) AS DOUBLE) /
        |             (((MAX(cum) + 2047) // 2048) * 2048), 6) AS fill_rate
        |FROM c GROUP BY 1""".stripMargin,
    "t10_repetition_signals" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, len(t) AS n_tokens,
        |         len(list_distinct(t)) AS n_distinct
        |  FROM toks WHERE len(t) > 0),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |           i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks WHERE len(t) >= 2),
        |top AS (
        |  SELECT doc_id, CAST(MAX(ct) AS BIGINT) AS top_ct FROM (
        |    SELECT doc_id, bg, count(*) AS ct FROM bg GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |       CAST(b.n_distinct AS BIGINT) AS n_distinct,
        |       round((b.n_tokens - b.n_distinct) /
        |             CAST(b.n_tokens AS DOUBLE), 6) AS dup_frac,
        |       COALESCE(top.top_ct, 0) AS top_bigram_ct
        |FROM base b LEFT JOIN top ON b.doc_id = top.doc_id""".stripMargin)
}
