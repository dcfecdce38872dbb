package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}

/** Text-analysis operators over the documents table: the reference's
  * keyword pipeline (G2 ik_analyze UDTF + explode,
  * KeywordUDTF.java:14-21 / KeywordUtil.java:16-34, call site
  * DwsTrafficSourceKeywordPageViewWindow.java:30,50-52) generalized into
  * the text toolkit a 100 TB training-data pipeline needs: tokenization,
  * token statistics, quality scoring, language-ID, and content
  * fingerprinting.
  *
  * Everything is built from codegen'd builtins (split / explode /
  * higher-order array functions / md5) — no Scala UDFs in these paths, so
  * the whole map side stays inside WholeStageCodegen and the only shuffle
  * is the final aggregation.
  */
object TextOps extends QueryModule {

  /** G2 tokenizer: the IK segmenter is a jar dependency in the reference
    * (pom.xml:205-209); the public stand-in is whitespace segmentation.
    * Returns ARRAY<STRING> — the UDTF's ROW<word STRING> collect. */
  def tokenize(c: Column): Column = split(c, " ")

  /** CJK-capable tokenizer — the public-knowledge stand-in for the IK
    * segmenter over the reference's actual (Chinese) domain
    * (KeywordUtil.java:16-34): whitespace-split first; an all-ASCII token
    * passes through, a token containing non-ASCII characters is segmented
    * into overlapping character bigrams (the classic CJK bigram indexing
    * unit — no dictionary, deterministic, engine-portable). Everything is
    * codegen'd builtins (split / transform / substr), so it stays inside
    * WholeStageCodegen like [[tokenize]]. */
  def tokenizeMixed(c: Column): Column =
    flatten(transform(split(c, " "), t =>
      when(t.rlike("^[\\x00-\\x7F]*$") || length(t) <= 1, array(t))
        .otherwise(transform(sequence(lit(1), length(t) - 1),
          i => t.substr(i, lit(2))))))

  /** Normalized content fingerprint (md5 of lowercased, space-collapsed
    * text) — the exact-dedup / doc-identity key. */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), " +", " ")))

  // Per-language stopword marker sets for the n-gram-free language-ID
  // heuristic (a deliberately SQL-expressible scorer so the DuckDB oracle
  // can state identical semantics).
  val enStops = Seq("the", "a", "of", "and", "to", "in")
  val esStops = Seq("el", "la", "de", "y", "que", "los")
  val frStops = Seq("le", "la", "et", "les", "des", "une")

  private[operators] def hits(tokens: Column, stops: Seq[String]): Column =
    size(filter(tokens, t => t.isin(stops.map(x => x: Any): _*)))

  /** G1/G2/A1: tokenize + explode + count — the keyword-frequency query
    * (top 20, deterministically tie-broken). */
  private def topTokens(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(explode(tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("word_ct"))
      .orderBy(col("word_ct").desc, col("word"))
      .limit(20)
  }

  /** Token statistics per document: counts + distinct ratio. */
  private def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"), tokenize(col("text")).as("toks"), col("n_chars"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        size(array_distinct(col("toks"))).cast(LongType).as("n_distinct"),
        col("n_chars"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast(DoubleType) / col("n_tokens"))
  }

  /** Quality scoring: stopword ratio, average token length, length prior —
    * the length/punct/stopword heuristics of pretraining-data filters,
    * combined with fixed double arithmetic (identical op order in the
    * oracle → bit-identical scores). */
  private def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val toks = tokenize(col("text"))
    d.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        hits(col("toks"), enStops).cast(LongType).as("stop_ct"),
        aggregate(transform(col("toks"), t => length(t)), lit(0),
          (acc, x) => acc + x).cast(LongType).as("char_sum"))
      .withColumn("stop_ratio",
        col("stop_ct").cast(DoubleType) / col("n_tokens"))
      .withColumn("avg_tok_len",
        col("char_sum").cast(DoubleType) / col("n_tokens"))
      .withColumn("quality_score",
        col("stop_ratio") * lit(0.3) +
          least(col("n_tokens"), lit(100L)).cast(DoubleType) / lit(100.0) * lit(0.7))
  }

  /** Language-ID: stopword-marker scoring with a deterministic argmax
    * (en ≥ es ≥ fr precedence), reported as a (lang, predicted) confusion
    * aggregate against the labeled lang column. */
  private def langId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val toks = tokenize(col("text"))
    d.select(col("lang"), toks.as("toks"))
      .select(col("lang"),
        hits(col("toks"), enStops).as("en_hits"),
        hits(col("toks"), esStops).as("es_hits"),
        hits(col("toks"), frStops).as("fr_hits"))
      .withColumn("predicted",
        when(col("en_hits") >= col("es_hits") &&
             col("en_hits") >= col("fr_hits"), "en")
          .when(col("es_hits") >= col("fr_hits"), "es")
          .otherwise("fr"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("doc_ct"))
  }

  /** Fingerprint rollup per source: exact-duplicate mass per shard. */
  private def fingerprintStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("doc_ct"),
        countDistinct(col("fp")).as("distinct_ct"),
        (count(lit(1)) - countDistinct(col("fp"))).as("dup_ct"))
  }

  /** BPE-ish regex tokenization (word runs + digit runs) — the
    * pre-tokenizer shape of byte-pair encoders; counted per doc and
    * contrasted with whitespace segmentation. */
  private def bpeTokens(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)").as("bpe"),
        tokenize(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("bpe")).cast(LongType).as("bpe_ct"),
        size(col("ws")).cast(LongType).as("ws_ct"),
        size(array_distinct(col("bpe"))).cast(LongType).as("bpe_distinct"))
  }

  /** t7: rank-based (discrete) quantiles of document length per source —
    * the value at ceil(q·n) in sorted order, integer logic only, so both
    * engines agree bit-exactly (continuous interpolation differs in
    * float op order across engines). One shuffle on the group key; at
    * 100 TB the same shape runs as a sort within each source partition. */
  private def lengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    val ranked = d.select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
    def pick(q: Double) = max(when(
      col("rn") === greatest(ceil(lit(q) * col("n")).cast("long"), lit(1L)),
      col("n_chars"))).cast(LongType)
    ranked.groupBy(col("source"))
      .agg(pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"),
        max(col("n")).as("doc_ct"))
  }

  /** G1/G2 variant — posexplode: fan-out WITH the element position (the
    * ordinality the reference's display fan-out keeps implicitly via
    * per-element copy; DwdBaseLog.java:229-266). */
  private def posexplodeTokens(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(tokenize(col("text"))).as(Seq("pos", "tok")))
  }

  /** Deterministic CJK phrases appended per doc for the t8 mixed-script
    * fixture (the testdata documents are ASCII; the reference's domain is
    * Chinese). One phrase carries an internal space so the whitespace and
    * bigram stages compose. */
  val cjkPhrases: Seq[String] = Seq("数据仓库", "实时计算", "流处理",
    "大数据 分析", "spark引擎")

  /** t8: mixed-script keyword counts — documents augmented with a
    * deterministic CJK phrase keyed on doc_id, tokenized by
    * [[tokenizeMixed]] (ASCII tokens whole, CJK tokens as overlapping
    * character bigrams), top 30 by frequency. */
  private def cjkTokens(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").filter(col("doc_id") < 200)
    val phrase = element_at(array(cjkPhrases.map(lit): _*),
      (pmod(col("doc_id"), lit(cjkPhrases.size.toLong)) + 1).cast("int"))
    d.select(col("doc_id"),
        explode(tokenizeMixed(concat(col("text"), lit(" "), phrase)))
          .as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tok_ct"),
        countDistinct(col("doc_id")).as("doc_ct"))
      .orderBy(col("tok_ct").desc, col("tok"))
      .limit(30)
  }

  /** t9: winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS local-fingerprint scheme): token hashes → polynomial
    * rolling hash over k=4-token grams → min of each w=5 window →
    * distinct mins per doc, rolled up per source as total vs distinct
    * fingerprint mass (the local-overlap dedup signal whole-doc md5
    * can't see).
    *
    * Shape: ROW-wise, not nested array lambdas — posexplode tokens, one
    * codegen'd md5 per row, the rolling hash via lead() and the winnow
    * min via a sliding window frame (two passes over one per-doc
    * window sort). Nested transform() lambdas here would collapse into
    * one expression whose every winnow element re-evaluates the k-gram
    * array and in turn the whole hash array — O(n³) interpreted eval
    * per doc (measured: one 690 s task at sf0.1 vs ~1 s for this
    * form). Docs shorter than k+w-1 tokens carry no full window and
    * are excluded. */
  /** Per-doc distinct winnowing fingerprints (the t9 pipeline up to the
    * per-doc fp set) — shared by the t9 per-source rollup and the t16
    * pairwise local-overlap join. */
  private def winnowFps(s: SparkSession, dir: String): DataFrame = {
    val A = 31L
    val P = 4294967291L // prime < 2^32: h*31^3 stays < 2^63
    val d = Tables(s, dir, "documents")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    d.select(col("source"), col("doc_id"),
        posexplode(tokenize(col("text"))).as(Seq("pos", "tok")))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast(LongType))
      .withColumn("h1", lead(col("h"), 1).over(wOrd))
      .withColumn("h2", lead(col("h"), 2).over(wOrd))
      .withColumn("h3", lead(col("h"), 3).over(wOrd))
      .filter(col("h3").isNotNull) // pos now indexes the 4-gram start
      .withColumn("kh",
        (col("h") * lit(A * A * A) + col("h1") * lit(A * A) +
          col("h2") * lit(A) + col("h3")) % lit(P))
      .withColumn("wmin", min(col("kh")).over(wOrd.rowsBetween(0, 4)))
      .withColumn("mx", max(col("pos")).over(wDoc))
      .filter(col("pos") <= col("mx") - 4) // full 5-windows only
      .select(col("source"), col("doc_id"), col("wmin")).distinct()
  }

  private def winnowFingerprints(s: SparkSession, dir: String): DataFrame =
    winnowFps(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("fp_total"),
        countDistinct(col("wmin")).as("fp_distinct"))

  /** t16: pairwise local-overlap detection (the MOSS join — Schleimer,
    * Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD 2003 §5): doc pairs sharing ≥ 3 winnow
    * fingerprints, found by a FINGERPRINT-KEYED self-join — never
    * doc×doc. Fingerprints appearing in > 20 docs are dropped first
    * (stop-gram hygiene): they carry no discriminative signal and their
    * buckets are the quadratic blowup risk, the same df-cap every
    * plagiarism/near-dup index applies. Complements d3 (whole-doc
    * Jaccard) and t14 (span fractions) with the pair-level local
    * overlap evidence. */
  private def winnowOverlapPairs(s: SparkSession, dir: String): DataFrame = {
    val fps = winnowFps(s, dir).select(col("doc_id"), col("wmin"))
    val cap = fps.groupBy(col("wmin")).agg(count(lit(1)).as("dfp"))
      .filter(col("dfp") <= 20).select(col("wmin"))
    val kept = fps.join(cap, "wmin")
    val b = kept.select(col("wmin").as("w2"), col("doc_id").as("b_id"))
    kept.select(col("wmin"), col("doc_id").as("a_id"))
      .join(b, col("wmin") === col("w2") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= 3)
  }

  /** t11: TF-IDF-style distinctive terms — tf over the document, df over
    * the whole corpus, top-3 per document ranked (tf DESC, df ASC, term)
    * so a term frequent HERE but rare EVERYWHERE wins. The ranking is
    * integer-only on purpose: ln()-based idf differs in the last ulp
    * across engines/libm, integer (tf, df) ranking is bit-portable —
    * downstream consumers can scale tf·ln(N/df) themselves.
    *
    * Scale: explode → (doc,term) count → (term) df — two keyed shuffles
    * on the corpus' natural keys; df is corpus-global (must see every
    * doc) while the final rank is restricted to the query's doc slice. */
  private def distinctiveTerms(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(filter(tokenize(lower(col("text"))), t => t =!= ""))
          .as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.filter(col("doc_id") < 100)
      .join(df, "term")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rk"))
  }

  /** t12: inverted-index build — the retrieval-side structure a corpus
    * pipeline materializes next to the text: token → document-frequency,
    * total term-frequency, posting-list bounds and an order-independent
    * posting checksum (sum of doc_ids). Two shuffles, both map-side
    * combinable: (token, doc) tf then token rollup — the exact shape of
    * a distributed index build at 100 TB (the posting lists themselves
    * would be written per token-range partition; the scalars here are
    * the index's statistics page). Top 50 postings by df with the token
    * string as total-order tie-break. */
  private def invertedIndex(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(tokenize(col("text"))).as("word"))
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_sum"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        sum(col("doc_id")).as("posting_sum"))
      .orderBy(col("df").desc, col("word")).limit(50)

  /** t13: unigram-entropy + alphabetic-fraction quality gate — the
    * gibberish/boilerplate detector family (Gopher-style rules): token
    * entropy H = ln(n) − Σ tf·ln(tf)/n flags low-diversity docs
    * (repeated boilerplate → H≈0), alpha_frac flags symbol soup. The
    * per-term tf·ln(tf) values are quantized to DECIMAL before the
    * cross-row sum, so the aggregate is order-independent (bit-stable on
    * any cluster and vs the oracle) even though ln itself is libm. The
    * gate thresholds are integer-only comparisons. */
  private def textEntropy(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(tokenize(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("distinct_ct"),
        sum(round(col("tf").cast(DoubleType) *
            log(col("tf").cast(DoubleType)), 9).cast(DecimalType(28, 9)))
          .cast(DoubleType).as("slog"),
        sum(when(col("tok").rlike("^[A-Za-z]+$"), col("tf"))
          .otherwise(0L)).as("alpha_ct"))
      .select(col("doc_id"), col("n_tokens"), col("distinct_ct"),
        round(log(col("n_tokens").cast(DoubleType)) -
          col("slog") / col("n_tokens"), 6).as("token_entropy"),
        round(col("alpha_ct").cast(DoubleType) / col("n_tokens"), 6)
          .as("alpha_frac"),
        (col("n_tokens") >= 10 &&
          col("alpha_ct") * lit(10L) >= col("n_tokens") * lit(5L))
          .as("gopher_ok"))
  }

  /** t14: duplicate-n-gram span fraction (Lee, Ippolito, Nystrom, Zhang,
    * Eck, Callison-Burch, Carlini, "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022) — the substring-level dedup
    * signal whole-document fingerprints miss: for every doc, the
    * fraction of its 5-gram spans that occur MORE THAN ONCE in the
    * corpus (anywhere — another doc or a repeat within the same doc).
    * Docs with ≥ 20 % duplicated spans are flagged for span-level
    * dedup/removal (integer-only threshold, engine-portable).
    *
    * Scale shape: explode → (doc, gram) counts (map-side combinable) →
    * (gram) global counts (map-side combinable) → hash join back on
    * gram → per-doc rollup. Never doc×doc: the corpus-wide duplicate
    * discovery is carried entirely by the gram-keyed shuffles, the same
    * shape ES/suffix-array pipelines reduce to when distributed. */
  private def dupNgramSpans(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables(s, dir, "documents")
      .select(col("doc_id"), tokenize(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 4),
        i => concat_ws(" ", element_at(col("tk"), i),
          element_at(col("tk"), i + 1), element_at(col("tk"), i + 2),
          element_at(col("tk"), i + 3), element_at(col("tk"), i + 4))))
        .as("gram"))
    val perDoc = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("ct"))
    val global = perDoc.groupBy(col("gram")).agg(sum(col("ct")).as("gct"))
    perDoc.join(global, "gram")
      .groupBy(col("doc_id"))
      .agg(sum(col("ct")).as("gram_ct"),
        sum(when(col("gct") >= 2, col("ct")).otherwise(0L))
          .as("dup_gram_ct"))
      .select(col("doc_id"), col("gram_ct"), col("dup_gram_ct"),
        round(col("dup_gram_ct").cast(DoubleType) / col("gram_ct"), 6)
          .as("dup_frac"),
        (col("dup_gram_ct") * lit(10L) >= col("gram_ct") * lit(2L))
          .as("flagged"))
  }

  /** t19: merged duplicate-span extents — the CUT LIST the t14 fraction
    * only scores: for every doc, the maximal token ranges covered by
    * corpus-duplicated 5-gram spans (the gram at token position i covers
    * tokens [i, i+4]; a gram is duplicated when it occurs ≥ 2 times
    * anywhere in the corpus). Overlapping spans are merged into extents
    * by the classic gaps-and-islands pass: sort spans by start per doc,
    * open a new extent whenever a span starts past the running max end.
    * This is the removal step of substring-level dedup (Lee et al., ACL
    * 2022 §4: duplicated substrings are CUT, not whole docs dropped) —
    * the output says exactly which token ranges to cut and what fraction
    * of the doc goes.
    *
    * Scale shape: the duplicate discovery is the same gram-keyed
    * aggregation t14 pays (map-side combinable, never doc×doc); the
    * merge adds one doc-keyed window sort bounded by each doc's OWN
    * duplicated-span count. Integer-only interval arithmetic — the
    * extents are engine-exact, no float anywhere but the final audit
    * fraction. */
  /** The t19 core over an ARBITRARY (doc_id, text) frame — exposed
    * through [[graft.api.Graft.dupSpanExtents]]. */
  private[graft] def dupSpanExtentsFor(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), tokenize(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), size(col("tk")).as("n_tokens"),
        posexplode(transform(
          sequence(lit(1), size(col("tk")) - 4),
          i => concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1), element_at(col("tk"), i + 2),
            element_at(col("tk"), i + 3), element_at(col("tk"), i + 4)))))
      .select(col("doc_id"), col("n_tokens"),
        (col("pos") + 1).as("start"), col("col").as("gram"))
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("gct")).filter(col("gct") >= 2)
      .select(col("gram"))
    val spans = grams.join(dupGrams, "gram")
      .select(col("doc_id"), col("n_tokens"), col("start"),
        (col("start") + 4).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    spans
      .withColumn("pme",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pme").isNull || col("start") > col("pme"), 1).otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg(min(col("start")).as("es"), max(col("e")).as("ee"))
      .select(col("doc_id"), col("n_tokens"),
        (col("ee") - col("es") + 1).as("elen"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_extents"),
        sum(col("elen")).as("dup_tokens"),
        max(col("elen")).cast(LongType).as("longest_extent"))
      .select(col("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"),
        col("n_extents"), col("dup_tokens"), col("longest_extent"),
        round(col("dup_tokens").cast(DoubleType) / col("n_tokens"), 6)
          .as("cut_frac"))
  }

  private def dupSpanExtents(s: SparkSession, dir: String): DataFrame =
    dupSpanExtentsFor(Tables(s, dir, "documents"))

  /** t20: readability scoring — the Flesch–Kincaid grade estimate with
    * the classic dictionary-free syllable heuristic (a syllable ≈ one
    * maximal vowel run `[aeiouy]+`; sentences ≈ terminal-punctuation
    * count, floored at 1): grade = 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59. Readability bands are a standard
    * pretraining quality/complexity signal (age-appropriate corpus
    * slicing, textbook-vs-web mixing). All three counts are single
    * regexp/array passes per row (codegen'd, zero shuffle before the
    * final sort-free projection); the identical double op order makes
    * the score bit-equal in the oracle. */
  private def readability(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(tokenize(col("text"))).cast(LongType).as("words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]', 0)"))
          .cast(LongType), lit(1L)).as("sentences"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast(LongType).as("syllables"))
      .select(col("doc_id"), col("words"), col("sentences"),
        col("syllables"),
        round(lit(0.39) * (col("words").cast(DoubleType) /
            col("sentences")) +
          lit(11.8) * (col("syllables").cast(DoubleType) / col("words")) -
          lit(15.59), 6).as("fk_grade"))
  }

  /** t15: importance-resampling scores (the DSIR recipe — Xie,
    * Santurkar, Ma, Liang, "Data Selection for Language Models via
    * Importance Resampling", NeurIPS 2023): rank raw docs by how much
    * more likely they are under a TARGET domain's unigram model than
    * under the raw corpus' own, log w(x) = Σ_w tf_x(w)·[ln p̂_t(w) −
    * ln p̂_r(w)] with add-1 smoothing; the c5 eval slice
    * (doc_id ≡ 0 mod 37) plays the target domain. The per-VOCAB-WORD
    * log-ratio is computed once in the vocabulary dimension (bounded by
    * |V|, not corpus size), DECIMAL-quantized so the per-doc sum is
    * order-independent, then broadcast-joined onto per-doc tfs — at
    * 100 TB the corpus-side work is the same two token-keyed shuffles as
    * the t12 index build plus a map-side join; top-50 selection is
    * TakeOrderedAndProject (partial top-n, no full sort). */
  private def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(tokenize(col("text"))).as("tok"))
    val raw = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf_r"))
    val tgt = toks.filter(pmod(col("doc_id"), lit(37L)) === 0)
      .groupBy(col("tok").as("t_tok")).agg(count(lit(1)).as("tf_t"))
    val totals = raw.agg(sum(col("tf_r")).as("n_r"),
      count(lit(1)).as("v_sz"))
      .crossJoin(tgt.agg(coalesce(sum(col("tf_t")), lit(0L)).as("n_t")))
    val vocab = raw.join(tgt, col("tok") === col("t_tok"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("tok").as("v_tok"),
        round(
          log((coalesce(col("tf_t"), lit(0L)) + 1).cast(DoubleType)
            / (col("n_t") + col("v_sz")).cast(DoubleType)) -
          log((col("tf_r") + 1).cast(DoubleType)
            / (col("n_r") + col("v_sz")).cast(DoubleType)), 9)
          // (18,9) so tf(10,0) × logdiff(18,9) = (29,9) stays inside
          // Spark's 38-digit cap — a wider operand would trigger lossy
          // scale reduction on the product and drift off the oracle
          .cast(DecimalType(18, 9)).as("logdiff_q"))
    toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .join(vocab, col("tok") === col("v_tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf").cast(DecimalType(10, 0)) * col("logdiff_q"))
        .as("sq"),
        sum(col("tf")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sq").cast(DoubleType), 6).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id")).limit(50)
  }

  /** t18: bigram-LM log-perplexity scoring — the CCNet-style quality
    * filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data", LREC 2020): an add-one-smoothed
    * bigram language model is trained on the target slice (doc_id % 37
    * = 0, the t15 target domain) as two count tables, and every
    * document is scored by its average negative log-likelihood per
    * bigram under that LM — low score = target-like, the ranking CCNet
    * buckets a crawl by. Engine parity: per-bigram −ln P is rounded to
    * 9 places and DECIMAL-quantized BEFORE the cross-row sum (the t15
    * idiom), so the score is partition-order independent and
    * bit-replayable. Scale: the LM is two token-keyed aggregations over
    * the (small) target slice joined back by bigram/prefix key; doc
    * scoring shuffles on the bigram key only — no driver-side model
    * object, the "model" is a DataFrame like everything else. */
  private def bigramPerplexity(s: SparkSession, dir: String): DataFrame = {
    val tk = filter(tokenize(lower(col("text"))), t => t =!= "")
    val d = Tables(s, dir, "documents").select(col("doc_id"), tk.as("t"))
    val bgOf = (t: Column) => transform(sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
    val bg = d.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(bgOf(col("t"))).as("bg"))
    val tgtBg = bg.filter(pmod(col("doc_id"), lit(37L)) === 0)
    val c2 = tgtBg.groupBy(col("bg").as("m_bg"))
      .agg(count(lit(1)).as("c2"))
    val c1 = tgtBg
      .select(substring_index(col("bg"), " ", 1).as("m_w1"))
      .groupBy(col("m_w1")).agg(count(lit(1)).as("c1"))
    // V = distinct target unigrams + 1 (so the smoothing denominator is
    // always positive, even for a prefix the LM never saw)
    val v = d.filter(pmod(col("doc_id"), lit(37L)) === 0)
      .select(explode(col("t")).as("tok"))
      .agg((countDistinct(col("tok")) + 1L).as("v_sz"))
    val tf = bg.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    tf.join(c2, col("bg") === col("m_bg"), "left_outer")
      .join(c1, col("w1") === col("m_w1"), "left_outer")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("tf"),
        round(-log((coalesce(col("c2"), lit(0L)) + 1).cast(DoubleType)
            / (coalesce(col("c1"), lit(0L)) + col("v_sz")).cast(DoubleType)),
          9).cast(DecimalType(18, 9)).as("nll_q"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf").cast(DecimalType(10, 0)) * col("nll_q")).as("sq"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sq").cast(DoubleType) / col("n_bigrams"), 6)
          .as("avg_nll"))
      .orderBy(col("avg_nll"), col("doc_id")).limit(50)
  }

  /** t25: Moore–Lewis cross-entropy-difference selection (Moore &
    * Lewis, "Intelligent Selection of Language Model Training Data",
    * ACL 2010) — the classic targeted-data-selection score: every
    * document ranked by H_in(doc) − H_gen(doc), its per-bigram
    * cross-entropy under the in-domain LM minus that under a
    * general-corpus LM. Subtracting the general term cancels generic
    * fluency — a doc scores well (negative) only for being
    * target-LIKE, not merely common-word soup — the refinement over
    * t18's single-LM ranking (and the filter CCNet/Wenzek'20 describe
    * as their selection ancestor). Both LMs are t18's add-one bigram
    * count tables: in-domain = the doc_id % 37 target slice, general =
    * the whole corpus. One pass joins each doc's bigram tf against
    * both LMs; each Δnll is rounded then DECIMAL-quantized BEFORE the
    * cross-row sum (t15/t18 idiom) so scores replay bit-exactly.
    * Scale: identical to t18 — bigram-keyed shuffles only, both
    * "models" are DataFrames, nothing driver-side. */
  private def crossEntropySelection(s: SparkSession, dir: String)
      : DataFrame = {
    val tk = filter(tokenize(lower(col("text"))), t => t =!= "")
    val d = Tables(s, dir, "documents").select(col("doc_id"), tk.as("t"))
    val bgOf = (t: Column) => transform(sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
    val bg = d.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(bgOf(col("t"))).as("bg"))
    val tgtBg = bg.filter(pmod(col("doc_id"), lit(37L)) === 0)
    val c2t = tgtBg.groupBy(col("bg").as("t_bg"))
      .agg(count(lit(1)).as("c2t"))
    val c1t = tgtBg.select(substring_index(col("bg"), " ", 1).as("t_w1"))
      .groupBy(col("t_w1")).agg(count(lit(1)).as("c1t"))
    val c2g = bg.groupBy(col("bg").as("g_bg"))
      .agg(count(lit(1)).as("c2g"))
    val c1g = bg.select(substring_index(col("bg"), " ", 1).as("g_w1"))
      .groupBy(col("g_w1")).agg(count(lit(1)).as("c1g"))
    val v = d.filter(pmod(col("doc_id"), lit(37L)) === 0)
      .select(explode(col("t")).as("tok"))
      .agg((countDistinct(col("tok")) + 1L).as("v_t"))
      .crossJoin(d.select(explode(col("t")).as("tok"))
        .agg((countDistinct(col("tok")) + 1L).as("v_g")))
    val tf = bg.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    tf.join(c2t, col("bg") === col("t_bg"), "left_outer")
      .join(c1t, col("w1") === col("t_w1"), "left_outer")
      .join(c2g, col("bg") === col("g_bg"), "left_outer")
      .join(c1g, col("w1") === col("g_w1"), "left_outer")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("tf"),
        // Δnll = ln P_gen − ln P_in (add-one smoothing both sides):
        // ONE rounding of the raw-double difference, replayed verbatim
        round(
          log((coalesce(col("c2g"), lit(0L)) + 1).cast(DoubleType)
            / (coalesce(col("c1g"), lit(0L)) + col("v_g")).cast(DoubleType))
          - log((coalesce(col("c2t"), lit(0L)) + 1).cast(DoubleType)
            / (coalesce(col("c1t"), lit(0L)) + col("v_t")).cast(DoubleType)),
          9).cast(DecimalType(18, 9)).as("dnll_q"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf").cast(DecimalType(10, 0)) * col("dnll_q")).as("sq"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sq").cast(DoubleType) / col("n_bigrams"), 6)
          .as("ce_diff"))
  }

  /** t21: the Gopher-style within-doc repetition GATE (Rae et al. 2021,
    * §A1.1 lineage) — the decision layer over signals like
    * [[QualityOps]] t10's (t10 reports dup-token fraction and the top
    * bigram count; t21 adds the most-common-TOKEN share and the
    * duplicate 2-gram AND 3-gram fractions, then combines them into
    * one flag). Distinct from t14, whose duplicate grams are
    * CORPUS-wide: a doc that endlessly repeats ITSELF passes t14 (its
    * grams are rare globally) but fails these. The flag is pure
    * integer arithmetic (ct·5 > n ⇔ share > 0.2 without a float ever
    * crossing an engine). Scale shape: gram totals/distincts are
    * higher-order array ops computed map-side per row (no gram ever
    * shuffles); the top-token count is the one (doc,tok)-keyed
    * two-level aggregation, map-side combinable, joined back on the
    * doc key. */
  private def repetitionRules(s: SparkSession, dir: String): DataFrame =
    repetitionGateFor(Tables(s, dir, "documents"))

  /** The t21 core over an ARBITRARY (doc_id, text) frame — exposed
    * through [[graft.api.Graft.repetitionGate]]. */
  private[graft] def repetitionGateFor(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
    val top = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("ct"))
      .groupBy(col("doc_id")).agg(max(col("ct")).as("top_tok_ct"))
    def grams(n: Int): Column = {
      val sz = size(col("toks"))
      when(sz >= n,
        transform(sequence(lit(1), sz - lit(n - 1)),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("toks"), i + lit(k))): _*)))
        .otherwise(array().cast(ArrayType(StringType)))
    }
    val gstats = base
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("n_tokens"),
        grams(2).as("g2"), grams(3).as("g3"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("g2")).cast(LongType).as("gram2_ct"),
        (size(col("g2")) - size(array_distinct(col("g2"))))
          .cast(LongType).as("dup2_ct"),
        size(col("g3")).cast(LongType).as("gram3_ct"),
        (size(col("g3")) - size(array_distinct(col("g3"))))
          .cast(LongType).as("dup3_ct"))
    gstats.join(top, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("top_tok_ct"),
        col("gram2_ct"), col("dup2_ct"), col("gram3_ct"), col("dup3_ct"),
        (col("top_tok_ct") * 5 > col("n_tokens") ||
          col("dup2_ct") * 5 > col("gram2_ct") ||
          col("dup3_ct") * 10 > col("gram3_ct") * 3).as("flagged"))
  }

  /** t22 vocabulary size — top-N corpus tokens by (count DESC, token)
    * total order; small enough to broadcast at any corpus size (a
    * vocab is a few hundred thousand rows even for a 100 TB corpus). */
  val vocabSize = 500

  /** t22: vocabulary-coverage / OOV audit — the tokenizer-design gate:
    * fix the corpus vocabulary at the [[vocabSize]] most frequent
    * tokens and measure, per source, what fraction of token mass falls
    * outside it (the OOV rate a fixed-vocab tokenizer would map to
    * <unk>). A source with a high OOV rate under the shared vocab is
    * the one that needs vocab budget (or its own merges) before
    * training. Distinct from t15 (DSIR importance weights target
    * RE-SAMPLING; this measures REPRESENTATION loss at a fixed vocab).
    * Scale: one (tok)-keyed count + a top-N (TakeOrderedAndProject,
    * partial per partition), vocab broadcasts back into a map-side
    * probe of the exploded token stream, one source-keyed rollup —
    * integer counts end to end, one final rounded division. */
  private def vocabCoverage(s: SparkSession, dir: String): DataFrame =
    vocabCoverageFor(Tables(s, dir, "documents"), vocabSize)

  /** The t22 core over an ARBITRARY (source, text) frame — exposed
    * through [[graft.api.Graft.vocabCoverage]]. */
  private[graft] def vocabCoverageFor(docs: DataFrame, n: Int): DataFrame = {
    val toks = docs
      .select(col("source"), explode(tokenize(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("tok")).limit(n)
      .select(col("tok").as("v_tok"))
    toks.join(broadcast(vocab), col("tok") === col("v_tok"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("token_ct"),
        sum(when(col("v_tok").isNull, 1L).otherwise(0L)).as("oov_ct"),
        countDistinct(when(col("v_tok").isNull, col("tok")))
          .as("oov_distinct_ct"))
      .select(col("source"), col("token_ct"), col("oov_ct"),
        col("oov_distinct_ct"),
        round(col("oov_ct").cast(DoubleType) /
          col("token_ct").cast(DoubleType), 6).as("oov_rate"))
  }

  /** t23: code-vs-prose gate — symbol-character density (braces,
    * semicolons, operators) and digit density, the cheap surface signals
    * code-detection filters key on before any classifier sees the doc
    * (natural-language corpora sit near zero on both; source files
    * spike). Char-class counting is keep-only regexp_replace + length
    * with the IDENTICAL regex in both engines, so the oracle replays the
    * computation rather than stating planted expectations (organic rows
    * crossing a threshold at larger SF stay in agreement by
    * construction). Per-doc flags roll up per (source, lang) with
    * integer sums only; the two doubles are final one-shot divisions —
    * order-independent at any parallelism. One scan, one hash aggregate,
    * everything inside whole-stage codegen. */
  private def codeFraction(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val symCt = length(regexp_replace(col("text"), "[^{}();=\\[\\]<>]", ""))
    val digCt = length(regexp_replace(col("text"), "[^0-9]", ""))
    d.select(col("source"), col("lang"),
        length(col("text")).as("n"), symCt.as("sym_ct"),
        digCt.as("dig_ct"))
      .withColumn("is_code",
        col("sym_ct").cast(DoubleType) / col("n") > 0.02 ||
          col("dig_ct").cast(DoubleType) / col("n") > 0.3)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("doc_ct"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("code_ct"),
        sum(col("sym_ct")).cast(LongType).as("sym_sum"),
        sum(col("n")).cast(LongType).as("char_sum"))
      .select(col("source"), col("lang"), col("doc_ct"), col("code_ct"),
        round(col("code_ct").cast(DoubleType) / col("doc_ct"), 6)
          .as("code_frac"),
        round(col("sym_sum").cast(DoubleType) / col("char_sum"), 6)
          .as("sym_density"))
  }

  /** t24: tokenizer fertility audit — the tokenizer-choice table every
    * LLM data team builds before committing a vocabulary: per
    * (source, lang), subword fertility (BPE-ish tokens per whitespace
    * word — the multilingual-cost metric; ~1 for well-covered English,
    * inflating for under-represented scripts) and compression
    * (chars per token — the context-window budget). Integer sums per
    * group with two final one-shot divisions (t23's discipline), so the
    * result is order-independent at any parallelism; one scan, one
    * hash aggregate, all inside whole-stage codegen. Complements t22's
    * OOV mass (vocabulary coverage) with the cost-per-word lens. */
  private def tokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    d.select(col("source"), col("lang"), col("n_chars"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
          .cast(LongType).as("bpe_ct"),
        size(tokenize(col("text"))).cast(LongType).as("ws_ct"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("doc_ct"),
        sum(col("n_chars")).cast(LongType).as("char_sum"),
        sum(col("bpe_ct")).cast(LongType).as("bpe_sum"),
        sum(col("ws_ct")).cast(LongType).as("ws_sum"))
      .select(col("source"), col("lang"), col("doc_ct"), col("char_sum"),
        col("bpe_sum"), col("ws_sum"),
        round(col("bpe_sum").cast(DoubleType) / col("ws_sum"), 6)
          .as("fertility"),
        round(col("char_sum").cast(DoubleType) / col("bpe_sum"), 6)
          .as("chars_per_token"))
  }

  /** t26 (beyond-reference): document-edge template detection — the
    * boilerplate lens t14/t19 (mid-document duplicated n-grams) do not
    * cover: shared 5-token document PREFIXES and SUFFIXES within a
    * source, the "same intro / same footer" signature of templated or
    * scraper-generated pages (the line-level boilerplate pass of
    * C4/RefinedWeb, restated for a corpus whose docs carry no newlines).
    * Per (source, edge kind): participating docs, distinct edge grams,
    * grams shared by ≥ 2 docs (templates), docs bound by a template,
    * and the hottest template under a (count DESC, gram ASC) total
    * order. On THIS corpus the truthful answer is ≈ zero templates
    * (near-dup plants mutate edges too) — stated as explicit zero/NULL
    * rows per c24's discipline, which is exactly what the report is
    * for: proving a corpus clean is the same query as finding it dirty.
    * Scale shape: only the two 5-token edge slices shuffle (never the
    * document body), keyed by (source, kind, gram); the report is
    * bounded by sources × 2. */
  private def templateSpans(s: SparkSession, dir: String): DataFrame = {
    val toks = tokenize(col("text"))
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), toks.as("toks"))
      .filter(size(col("toks")) >= 10)
      .select(col("source"),
        concat_ws(" ", slice(col("toks"), 1, 5)).as("prefix"),
        concat_ws(" ", slice(col("toks"), -5, 5)).as("suffix"))
    val c = d.select(col("source"), explode(map(
        lit("prefix"), col("prefix"), lit("suffix"), col("suffix")))
        .as(Seq("kind", "gram")))
      .groupBy(col("source"), col("kind"), col("gram"))
      .agg(count(lit(1)).as("ct"))
    c.groupBy(col("source"), col("kind"))
      .agg(sum(col("ct")).as("doc_ct"),
        count(lit(1)).as("distinct_grams"),
        sum(when(col("ct") >= 2, 1L).otherwise(0L)).as("template_ct"),
        coalesce(sum(when(col("ct") >= 2, col("ct"))), lit(0L))
          .as("templated_docs"),
        min(when(col("ct") >= 2,
          struct((-col("ct")).as("neg"), col("gram").as("g")))).as("best"))
      .select(col("source"), col("kind"), col("doc_ct"),
        col("distinct_grams"), col("template_ct"), col("templated_docs"),
        (-col("best.neg")).as("top_ct"), col("best.g").as("top_gram"))
  }

  /** t27 (beyond-reference): Zipf rank-frequency fit — the
    * vocabulary-health lens next to t22's OOV mass and t24's fertility:
    * natural language follows freq ∝ rank^s with s ≈ −1 (Zipf's law);
    * machine-generated, templated, or heavily-duplicated text bends the
    * curve, so the fitted slope per source is a cheap distribution-level
    * generator/contamination signal. Fit = ordinary least squares of
    * ln(freq) on ln(rank) over each source's top-100 tokens under a
    * (count DESC, token) total order. Per-row ln products are rounded
    * to 9 decimals and DECIMAL-quantized before the cross-row sums
    * (absorbing last-ulp ln() differences between engines — t13's
    * discipline), then the slope/intercept are one-shot IEEE chains
    * over the exact sums. Shuffles: the (source, token) count and one
    * rank window per source; the fit itself is a 5-sum fold. */
  private def zipfSlope(s: SparkSession, dir: String): DataFrame =
    zipfFit(Tables(s, dir, "documents")
      .select(col("source"), col("text")))

  /** t28 (beyond-reference): token burstiness (Church/Gale gap
    * statistics) — natural language repeats words in BURSTS, generated
    * or templated text repeats them at near-regular intervals, so the
    * dispersion of the gaps between a token's occurrences inside one
    * document is a content-quality signal Zipf (t27) and the repetition
    * rules (t21) cannot see. For every (doc, token) with ≥ 3
    * occurrences: gaps between consecutive positions, B = (σ−μ)/(σ+μ)
    * ∈ [−1, 1) — negative = regular/periodic, ~0 = Poisson, positive =
    * bursty. Per-language rollup. Float discipline: gaps and their
    * squares are integers (exact in any summation order); μ/σ come from
    * one division each; the cross-row fold of B quantizes to DECIMAL
    * first (order-independent). Shuffles: one (doc, token) gap window +
    * the language rollup. */
  private def burstiness(s: SparkSession, dir: String): DataFrame =
    burstinessFor(Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")))

  /** The generic burstiness core over an ARBITRARY (doc_id, lang, text)
    * frame — behind t28 and [[graft.api.Graft.burstiness]]. */
  private[graft] def burstinessFor(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"), col("tok"))
      .orderBy(col("pos"))
    val gaps = docs
      .select(col("doc_id"), col("lang"),
        posexplode(tokenize(col("text"))).as(Seq("pos", "tok")))
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(w))
      .filter(col("gap").isNotNull)
    val perPair = gaps
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"),
        sum(col("gap").cast(LongType)).as("sg"),
        sum((col("gap") * col("gap")).cast(LongType)).as("sg2"))
      .filter(col("n") >= 2)
      .withColumn("mu", col("sg").cast(DoubleType) / col("n"))
      .withColumn("sigma", sqrt(
        col("sg2").cast(DoubleType) / col("n") - col("mu") * col("mu")))
      .withColumn("b",
        (col("sigma") - col("mu")) / (col("sigma") + col("mu")))
    perPair.groupBy(col("lang"))
      .agg(count(lit(1)).as("pair_ct"),
        round(sum(round(col("b"), 6).cast(DecimalType(28, 6)))
          .cast(DoubleType) /
          count(lit(1)), 6).as("avg_burstiness"),
        round(sum(when(col("b") > 0.0, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)), 6).as("bursty_share"))
  }

  /** The generic Zipf-fit core over an ARBITRARY (source, text) frame —
    * behind t27 and [[graft.api.Graft.zipfFit]]. */
  private[graft] def zipfFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col("source"), explode(tokenize(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("ct"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("ct").desc, col("token"))
    val q9 = (c: Column) => round(c, 9).cast(DecimalType(28, 9))
    val sums = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 100)
      .select(col("source"),
        log(col("rk").cast(DoubleType)).as("x"),
        log(col("ct").cast(DoubleType)).as("y"))
      .select(col("source"), q9(col("x")).as("xq"), q9(col("y")).as("yq"),
        q9(col("x") * col("y")).as("xyq"),
        q9(col("x") * col("x")).as("xxq"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_top"),
        sum(col("xq")).cast(DoubleType).as("sx"),
        sum(col("yq")).cast(DoubleType).as("sy"),
        sum(col("xyq")).cast(DoubleType).as("sxy"),
        sum(col("xxq")).cast(DoubleType).as("sxx"))
    val slope = (col("n_top") * col("sxy") - col("sx") * col("sy")) /
      (col("n_top") * col("sxx") - col("sx") * col("sx"))
    sums.select(col("source"), col("n_top"),
      round(slope, 6).as("zipf_slope"),
      round((col("sy") - slope * col("sx")) / col("n_top"), 6)
        .as("zipf_intercept"))
  }

  /** t29 (beyond-reference): corpus-saturation audit — per ingestion
    * decile, what fraction of the incoming word 3-grams are NOVEL (first
    * seen in that doc, doc_id playing crawl order)? The curve data
    * teams read before buying more of the same source: a healthy
    * growing corpus keeps a high novel fraction; a saturated or
    * template-heavy one decays toward zero (this synthetic corpus,
    * built from a small vocabulary, decays hard — exactly what the
    * audit should say). Scale shape: one gram-keyed aggregation finds
    * each 3-gram's first-seen doc, the join back rides the same gram
    * Exchange, then a doc rollup and a 10-row decile rollup; the
    * decile is closed-form over a broadcast max-id (no global sort —
    * the a34 discipline). Novel fraction is a one-shot division. */
  private def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val grams = d
      .select(col("doc_id"), tokenize(col("text")).as("tk"))
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), greatest(size(col("tk")) - 2, lit(1))),
        i => concat_ws(" ", element_at(col("tk"), i),
          element_at(col("tk"), i + 1), element_at(col("tk"), i + 2)))))
        .as("g"))
    val firstSeen = grams.groupBy(col("g"))
      .agg(min(col("doc_id")).as("first_doc"))
    val perDoc = grams.join(firstSeen, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("gram_ct"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("novel_ct"))
    val mx = d.agg(max(col("doc_id")).as("max_id"))
    perDoc.crossJoin(broadcast(mx))
      .withColumn("decile",
        least(lit(9L), floor(col("doc_id") * 10 / (col("max_id") + 1))
          .cast(LongType)))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("doc_ct"),
        sum(col("gram_ct")).as("gram_ct"),
        sum(col("novel_ct")).as("novel_ct"))
      .withColumn("novel_frac",
        round(col("novel_ct").cast(DoubleType) / col("gram_ct"), 6))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "t29_ngram_novelty" -> ngramNovelty,
    "t27_zipf_slope" -> zipfSlope,
    "t28_burstiness" -> burstiness,
    "t26_template_spans" -> templateSpans,
    "t24_tokenizer_fertility" -> tokenizerFertility,
    "t23_code_fraction" -> codeFraction,
    "t22_vocab_coverage" -> vocabCoverage,
    "t21_repetition_rules" -> repetitionRules,
    "t20_readability" -> readability,
    "t19_dup_span_extents" -> dupSpanExtents,
    "t25_cross_entropy_diff" -> crossEntropySelection,
    "t18_bigram_perplexity" -> bigramPerplexity,
    "t16_winnow_overlap_pairs" -> winnowOverlapPairs,
    "t15_dsir_scores" -> dsirScores,
    "t14_dup_ngram_spans" -> dupNgramSpans,
    "t13_text_entropy" -> textEntropy,
    "t12_inverted_index" -> invertedIndex,
    "t11_distinctive_terms" -> distinctiveTerms,
    "t9_winnow_fingerprints" -> winnowFingerprints,
    "t8_cjk_tokens" -> cjkTokens,
    "g4_posexplode_tokens" -> posexplodeTokens,
    "t7_length_quantiles" -> lengthQuantiles,
    "t1_top_tokens" -> topTokens,
    "t2_token_stats" -> tokenStats,
    "t3_quality_score" -> qualityScore,
    "t4_lang_id" -> langId,
    "t5_fingerprint_stats" -> fingerprintStats,
    "t6_bpe_tokens" -> bpeTokens)

  private def inList(xs: Seq[String]) = xs.map("'" + _ + "'").mkString(", ")

  private def pickSql(q: Double): String =
    s"max(CASE WHEN rn = greatest(CAST(ceil($q * n) AS BIGINT), 1) " +
      s"THEN n_chars END)"

  /** Oracle twin of [[winnowFps]]: the t9 rolling-hash pipeline down to
    * per-doc distinct fingerprint rows (`wf`), shared by t9 and t16. */
  private lazy val winnowCte: String = {
    val hexToInt = DedupOps.hexToIntSql("t")
    s"""hs AS (
       |  SELECT source, doc_id,
       |         list_transform(string_split(text, ' '),
       |                        t -> $hexToInt) AS hs
       |  FROM documents),
       |kg AS (
       |  SELECT source, doc_id,
       |         list_transform(range(1, len(hs) - 3 + 1),
       |           i -> (hs[i] * ${31L * 31 * 31} + hs[i+1] * ${31L * 31} +
       |                 hs[i+2] * 31 + hs[i+3]) % 4294967291) AS kg
       |  FROM hs WHERE len(hs) >= 8),
       |fps AS (
       |  SELECT source, doc_id,
       |         list_distinct(list_transform(range(1, len(kg) - 4 + 1),
       |           j -> list_aggregate(kg[j:j+4], 'min'))) AS fps
       |  FROM kg),
       |wf AS (SELECT source, doc_id, unnest(fps) AS fp FROM fps)""".stripMargin
  }

  val oracles = Map(
    "t29_ngram_novelty" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(tk) - 2, 1) + 1),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS g
        |  FROM tk),
        |fs AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1),
        |per AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS gram_ct,
        |         CAST(sum(CASE WHEN fs.first_doc = g.doc_id
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS novel_ct
        |  FROM g JOIN fs USING (g) GROUP BY 1),
        |mx AS (SELECT max(doc_id) AS max_id FROM documents)
        |SELECT least(9, (doc_id * 10) // (max_id + 1)) AS decile,
        |       CAST(count(*) AS BIGINT) AS doc_ct,
        |       CAST(sum(gram_ct) AS BIGINT) AS gram_ct,
        |       CAST(sum(novel_ct) AS BIGINT) AS novel_ct,
        |       round(CAST(sum(novel_ct) AS DOUBLE) / sum(gram_ct), 6)
        |         AS novel_frac
        |FROM per CROSS JOIN mx
        |GROUP BY 1""".stripMargin,
    "t27_zipf_slope" ->
      """WITH c AS (
        |  SELECT source, word, CAST(count(*) AS BIGINT) AS ct
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT source,
        |         ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(ct AS DOUBLE)) AS y
        |  FROM (SELECT *, row_number() OVER
        |          (PARTITION BY source ORDER BY ct DESC, word) AS rk
        |        FROM c)
        |  WHERE rk <= 100),
        |q AS (
        |  SELECT source,
        |         CAST(round(x, 9) AS DECIMAL(28,9)) AS xq,
        |         CAST(round(y, 9) AS DECIMAL(28,9)) AS yq,
        |         CAST(round(x * y, 9) AS DECIMAL(28,9)) AS xyq,
        |         CAST(round(x * x, 9) AS DECIMAL(28,9)) AS xxq
        |  FROM top),
        |sums AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_top,
        |         CAST(sum(xq) AS DOUBLE) AS sx,
        |         CAST(sum(yq) AS DOUBLE) AS sy,
        |         CAST(sum(xyq) AS DOUBLE) AS sxy,
        |         CAST(sum(xxq) AS DOUBLE) AS sxx
        |  FROM q GROUP BY 1)
        |SELECT source, n_top,
        |       round((n_top * sxy - sx * sy)
        |             / (n_top * sxx - sx * sx), 6) AS zipf_slope,
        |       round((sy - ((n_top * sxy - sx * sy)
        |                    / (n_top * sxx - sx * sx)) * sx)
        |             / n_top, 6) AS zipf_intercept
        |FROM sums""".stripMargin,
    "t26_template_spans" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 10),
        |g AS (
        |  SELECT source, 'prefix' AS kind,
        |         array_to_string(toks[1:5], ' ') AS gram FROM t
        |  UNION ALL
        |  SELECT source, 'suffix', array_to_string(toks[-5:], ' ') FROM t),
        |c AS (
        |  SELECT source, kind, gram, CAST(count(*) AS BIGINT) AS ct
        |  FROM g GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT *, max(CASE WHEN ct >= 2 THEN ct END)
        |           OVER (PARTITION BY source, kind) AS mx
        |  FROM c)
        |SELECT source, kind,
        |       CAST(sum(ct) AS BIGINT) AS doc_ct,
        |       CAST(count(*) AS BIGINT) AS distinct_grams,
        |       CAST(sum(CASE WHEN ct >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS template_ct,
        |       CAST(coalesce(sum(CASE WHEN ct >= 2 THEN ct END), 0)
        |            AS BIGINT) AS templated_docs,
        |       CAST(max(CASE WHEN ct >= 2 THEN ct END) AS BIGINT)
        |         AS top_ct,
        |       min(CASE WHEN ct >= 2 AND ct = mx THEN gram END)
        |         AS top_gram
        |FROM m GROUP BY source, kind""".stripMargin,
    "t24_tokenizer_fertility" ->
      """WITH per AS (
        |  SELECT source, lang, n_chars,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))
        |              AS BIGINT) AS bpe_ct,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_ct
        |  FROM documents)
        |SELECT source, lang, count(*) AS doc_ct,
        |       CAST(sum(n_chars) AS BIGINT) AS char_sum,
        |       CAST(sum(bpe_ct) AS BIGINT) AS bpe_sum,
        |       CAST(sum(ws_ct) AS BIGINT) AS ws_sum,
        |       round(CAST(sum(bpe_ct) AS DOUBLE) / sum(ws_ct), 6)
        |         AS fertility,
        |       round(CAST(sum(n_chars) AS DOUBLE) / sum(bpe_ct), 6)
        |         AS chars_per_token
        |FROM per GROUP BY 1, 2""".stripMargin,
    "t23_code_fraction" ->
      """WITH per AS (
        |  SELECT source, lang, length(text) AS n,
        |         length(regexp_replace(text, '[^{}();=\[\]<>]', '', 'g'))
        |           AS sym_ct,
        |         length(regexp_replace(text, '[^0-9]', '', 'g')) AS dig_ct
        |  FROM documents),
        |f AS (
        |  SELECT source, lang, n, sym_ct,
        |         CASE WHEN CAST(sym_ct AS DOUBLE) / n > 0.02
        |               OR CAST(dig_ct AS DOUBLE) / n > 0.3
        |              THEN 1 ELSE 0 END AS is_code
        |  FROM per)
        |SELECT source, lang, count(*) AS doc_ct,
        |       CAST(sum(is_code) AS BIGINT) AS code_ct,
        |       round(CAST(sum(is_code) AS DOUBLE) / count(*), 6)
        |         AS code_frac,
        |       round(CAST(sum(sym_ct) AS DOUBLE) / sum(n), 6)
        |         AS sym_density
        |FROM f GROUP BY 1, 2""".stripMargin,
    "t20_readability" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |         greatest(CAST(len(regexp_extract_all(text, '[.!?]'))
        |                       AS BIGINT), 1) AS sentences,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |              AS BIGINT) AS syllables
        |  FROM documents)
        |SELECT doc_id, words, sentences, syllables,
        |       round(0.39 * (CAST(words AS DOUBLE) / sentences) +
        |             11.8 * (CAST(syllables AS DOUBLE) / words) - 15.59,
        |             6) AS fk_grade
        |FROM m""".stripMargin,
    "t19_dup_span_extents" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |         unnest(range(1, len(tk) - 3)) AS start,
        |         unnest(list_transform(range(1, len(tk) - 3),
        |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
        |                          tk[i+4]))) AS gram
        |  FROM tk WHERE len(tk) >= 5),
        |dg AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2),
        |sp AS (SELECT doc_id, n_tokens, start, start + 4 AS e
        |       FROM g JOIN dg USING (gram)),
        |isl AS (
        |  SELECT doc_id, n_tokens, start, e,
        |         max(e) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM sp),
        |brk AS (
        |  SELECT doc_id, n_tokens, start, e,
        |         CASE WHEN pme IS NULL OR start > pme THEN 1 ELSE 0 END
        |           AS brk
        |  FROM isl),
        |ext AS (
        |  SELECT doc_id, n_tokens, start, e,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY start
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS island
        |  FROM brk),
        |ex2 AS (
        |  SELECT doc_id, n_tokens, island,
        |         max(e) - min(start) + 1 AS elen
        |  FROM ext GROUP BY 1, 2, 3)
        |SELECT doc_id, n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_extents,
        |       CAST(sum(elen) AS BIGINT) AS dup_tokens,
        |       CAST(max(elen) AS BIGINT) AS longest_extent,
        |       round(CAST(sum(elen) AS DOUBLE) / n_tokens, 6) AS cut_frac
        |FROM ex2 GROUP BY 1, 2""".stripMargin,
    "t25_cross_entropy_diff" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                             x -> x <> '') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |           i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM d WHERE len(t) >= 2),
        |c2t AS (SELECT bg AS t_bg, CAST(count(*) AS BIGINT) AS c2t
        |        FROM bg WHERE doc_id % 37 = 0 GROUP BY 1),
        |c1t AS (SELECT split_part(bg, ' ', 1) AS t_w1,
        |               CAST(count(*) AS BIGINT) AS c1t
        |        FROM bg WHERE doc_id % 37 = 0 GROUP BY 1),
        |c2g AS (SELECT bg AS g_bg, CAST(count(*) AS BIGINT) AS c2g
        |        FROM bg GROUP BY 1),
        |c1g AS (SELECT split_part(bg, ' ', 1) AS g_w1,
        |               CAST(count(*) AS BIGINT) AS c1g
        |        FROM bg GROUP BY 1),
        |v AS (SELECT
        |        (SELECT CAST(count(DISTINCT tok) + 1 AS BIGINT) FROM (
        |           SELECT unnest(t) AS tok FROM d WHERE doc_id % 37 = 0))
        |          AS v_t,
        |        (SELECT CAST(count(DISTINCT tok) + 1 AS BIGINT) FROM (
        |           SELECT unnest(t) AS tok FROM d)) AS v_g),
        |tf AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf,
        |              split_part(bg, ' ', 1) AS w1
        |       FROM bg GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, tf,
        |         CAST(round(
        |             ln(CAST(coalesce(c2g, 0) + 1 AS DOUBLE)
        |                / CAST(coalesce(c1g, 0) + v_g AS DOUBLE))
        |           - ln(CAST(coalesce(c2t, 0) + 1 AS DOUBLE)
        |                / CAST(coalesce(c1t, 0) + v_t AS DOUBLE)), 9)
        |           AS DECIMAL(18,9)) AS dnll_q
        |  FROM tf LEFT JOIN c2t ON bg = t_bg
        |          LEFT JOIN c1t ON w1 = t_w1
        |          LEFT JOIN c2g ON bg = g_bg
        |          LEFT JOIN c1g ON w1 = g_w1
        |          CROSS JOIN v)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |       round(CAST(sum(CAST(tf AS DECIMAL(10,0)) * dnll_q)
        |                  AS DOUBLE) / CAST(sum(tf) AS BIGINT), 6)
        |         AS ce_diff
        |FROM sc GROUP BY 1""".stripMargin,
    "t18_bigram_perplexity" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                             x -> x <> '') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |           i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM d WHERE len(t) >= 2),
        |c2 AS (SELECT bg AS m_bg, CAST(count(*) AS BIGINT) AS c2
        |       FROM bg WHERE doc_id % 37 = 0 GROUP BY 1),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS m_w1,
        |              CAST(count(*) AS BIGINT) AS c1
        |       FROM bg WHERE doc_id % 37 = 0 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT tok) + 1 AS BIGINT) AS v_sz FROM (
        |        SELECT unnest(t) AS tok FROM d WHERE doc_id % 37 = 0)),
        |tf AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf,
        |              split_part(bg, ' ', 1) AS w1
        |       FROM bg GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, tf,
        |         CAST(round(-ln(CAST(coalesce(c2, 0) + 1 AS DOUBLE)
        |             / CAST(coalesce(c1, 0) + v_sz AS DOUBLE)), 9)
        |           AS DECIMAL(18,9)) AS nll_q
        |  FROM tf LEFT JOIN c2 ON bg = m_bg
        |          LEFT JOIN c1 ON w1 = m_w1
        |          CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |         round(CAST(sum(CAST(tf AS DECIMAL(10,0)) * nll_q)
        |                    AS DOUBLE) / CAST(sum(tf) AS BIGINT), 6)
        |           AS avg_nll
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, n_bigrams, avg_nll
        |FROM agg ORDER BY avg_nll, doc_id LIMIT 50""".stripMargin,
    "t15_dsir_scores" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |raw AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf_r
        |        FROM toks GROUP BY 1),
        |tgt AS (SELECT tok AS t_tok, CAST(count(*) AS BIGINT) AS tf_t
        |        FROM toks WHERE doc_id % 37 = 0 GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT CAST(sum(tf_r) AS BIGINT) FROM raw) AS n_r,
        |         (SELECT count(*) FROM raw) AS v_sz,
        |         (SELECT CAST(coalesce(sum(tf_t), 0) AS BIGINT) FROM tgt)
        |           AS n_t),
        |vocab AS (
        |  SELECT tok AS v_tok,
        |         CAST(round(
        |           ln(CAST(coalesce(tf_t, 0) + 1 AS DOUBLE)
        |              / CAST(n_t + v_sz AS DOUBLE)) -
        |           ln(CAST(tf_r + 1 AS DOUBLE)
        |              / CAST(n_r + v_sz AS DOUBLE)), 9)
        |           AS DECIMAL(18,9)) AS logdiff_q
        |  FROM raw LEFT JOIN tgt ON tok = t_tok CROSS JOIN tot),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |         round(CAST(sum(CAST(tf AS DECIMAL(10,0)) * logdiff_q)
        |                    AS DOUBLE), 6) AS dsir_score
        |  FROM tf JOIN vocab ON tok = v_tok GROUP BY 1)
        |SELECT doc_id, n_tokens, dsir_score
        |FROM sc ORDER BY dsir_score DESC, doc_id LIMIT 50""".stripMargin,
    "t22_vocab_coverage" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |vc AS (SELECT tok, count(*) AS ct FROM tok GROUP BY 1),
         |vocab AS (
         |  SELECT tok AS v_tok FROM (
         |    SELECT tok, row_number() OVER (ORDER BY ct DESC, tok) AS rn
         |    FROM vc) WHERE rn <= $vocabSize)
         |SELECT source, count(*) AS token_ct,
         |       CAST(sum(CASE WHEN v_tok IS NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS oov_ct,
         |       count(DISTINCT CASE WHEN v_tok IS NULL THEN tok END)
         |         AS oov_distinct_ct,
         |       round(CAST(sum(CASE WHEN v_tok IS NULL THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*), 6) AS oov_rate
         |FROM tok LEFT JOIN vocab ON tok = v_tok
         |GROUP BY 1""".stripMargin,
    "t21_repetition_rules" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tt AS (
        |  SELECT doc_id, CAST(max(ct) AS BIGINT) AS top_tok_ct FROM (
        |    SELECT doc_id, tok, count(*) AS ct
        |    FROM (SELECT doc_id, unnest(tk) AS tok FROM tk)
        |    GROUP BY 1, 2)
        |  GROUP BY 1),
        |g AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |         list_transform(range(1, len(tk)),
        |           i -> concat_ws(' ', tk[i], tk[i+1])) AS g2,
        |         list_transform(range(1, len(tk) - 1),
        |           i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) AS g3
        |  FROM tk),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(len(g2) AS BIGINT) AS gram2_ct,
        |         CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) AS dup2_ct,
        |         CAST(len(g3) AS BIGINT) AS gram3_ct,
        |         CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) AS dup3_ct
        |  FROM g)
        |SELECT c.doc_id, n_tokens, top_tok_ct, gram2_ct, dup2_ct,
        |       gram3_ct, dup3_ct,
        |       (top_tok_ct * 5 > n_tokens OR dup2_ct * 5 > gram2_ct
        |        OR dup3_ct * 10 > gram3_ct * 3) AS flagged
        |FROM c JOIN tt ON c.doc_id = tt.doc_id""".stripMargin,
    "t14_dup_ngram_spans" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3),
        |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4])))
        |    AS gram
        |  FROM tk WHERE len(tk) >= 5),
        |pd AS (SELECT doc_id, gram, count(*) AS ct FROM g GROUP BY 1, 2),
        |gl AS (SELECT gram, CAST(sum(ct) AS BIGINT) AS gct
        |       FROM pd GROUP BY 1),
        |agg AS (
        |  SELECT doc_id, CAST(sum(ct) AS BIGINT) AS gram_ct,
        |         CAST(sum(CASE WHEN gct >= 2 THEN ct ELSE 0 END) AS BIGINT)
        |           AS dup_gram_ct
        |  FROM pd JOIN gl USING (gram) GROUP BY 1)
        |SELECT doc_id, gram_ct, dup_gram_ct,
        |       round(CAST(dup_gram_ct AS DOUBLE) / gram_ct, 6) AS dup_frac,
        |       dup_gram_ct * 10 >= gram_ct * 2 AS flagged
        |FROM agg""".stripMargin,
    "t13_text_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |m AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |         count(*) AS distinct_ct,
        |         CAST(sum(CAST(round(tf * ln(tf), 9) AS DECIMAL(28,9)))
        |              AS DOUBLE) AS slog,
        |         CAST(sum(CASE WHEN regexp_matches(tok, '^[A-Za-z]+$')
        |                       THEN tf ELSE 0 END) AS BIGINT) AS alpha_ct
        |  FROM tf GROUP BY 1)
        |SELECT doc_id, n_tokens, distinct_ct,
        |       round(ln(n_tokens) - slog / n_tokens, 6) AS token_entropy,
        |       round(CAST(alpha_ct AS DOUBLE) / n_tokens, 6) AS alpha_frac,
        |       (n_tokens >= 10 AND alpha_ct * 10 >= n_tokens * 5)
        |         AS gopher_ok
        |FROM m""".stripMargin,
    "t12_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |p AS (SELECT word, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
        |SELECT word, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_sum,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |       CAST(sum(doc_id) AS BIGINT) AS posting_sum
        |FROM p GROUP BY 1 ORDER BY df DESC, word LIMIT 50""".stripMargin,
    "t11_distinctive_terms" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(lower(text), ' '),
        |                            x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |r AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |           ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rk
        |  FROM tf JOIN df USING (term) WHERE tf.doc_id < 100)
        |SELECT doc_id, term, tf, df, rk FROM r WHERE rk <= 3""".stripMargin,
    "t9_winnow_fingerprints" ->
      s"""WITH $winnowCte
         |SELECT source, count(*) AS fp_total,
         |       count(DISTINCT fp) AS fp_distinct
         |FROM wf GROUP BY 1""".stripMargin,
    "t16_winnow_overlap_pairs" ->
      s"""WITH $winnowCte,
         |cap AS (SELECT fp FROM (SELECT fp, count(*) AS dfp FROM wf
         |                        GROUP BY 1) WHERE dfp <= 20),
         |k AS (SELECT doc_id, fp FROM wf JOIN cap USING (fp))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       CAST(count(*) AS BIGINT) AS shared_fp
         |FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,
    "t8_cjk_tokens" -> {
      val phrases = cjkPhrases.map("'" + _ + "'").mkString(", ")
      s"""WITH d AS (
         |  SELECT doc_id,
         |         text || ' ' || ([$phrases])[(doc_id % ${cjkPhrases.size}) + 1]
         |           AS mixed
         |  FROM documents WHERE doc_id < 200),
         |toks AS (
         |  SELECT doc_id, unnest(flatten(list_transform(
         |    string_split(mixed, ' '), t ->
         |      CASE WHEN regexp_matches(t, '^[\\x00-\\x7F]*${"$"}')
         |                OR length(t) <= 1 THEN [t]
         |           ELSE list_transform(range(1, length(t)),
         |                               i -> substr(t, CAST(i AS INT), 2))
         |      END))) AS tok
         |  FROM d)
         |SELECT tok, count(*) AS tok_ct, count(DISTINCT doc_id) AS doc_ct
         |FROM toks GROUP BY 1 ORDER BY tok_ct DESC, tok LIMIT 30""".stripMargin
    },
    "t28_burstiness" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, unnest(list_transform(
        |           range(1, len(string_split(text, ' ')) + 1),
        |           i -> {'pos': i - 1,
        |                 'tok': string_split(text, ' ')[i]})) AS x
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang, x.tok AS tok, x.pos AS pos,
        |         x.pos - lag(x.pos) OVER (PARTITION BY doc_id, x.tok
        |                                  ORDER BY x.pos) AS gap
        |  FROM tk),
        |pp AS (
        |  SELECT doc_id, lang, tok,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(gap) AS BIGINT) AS sg,
        |         CAST(sum(gap * gap) AS BIGINT) AS sg2
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2, 3
        |  HAVING count(*) >= 2),
        |b AS (
        |  SELECT lang,
        |         (sqrt(CAST(sg2 AS DOUBLE) / n
        |               - (CAST(sg AS DOUBLE) / n)
        |                 * (CAST(sg AS DOUBLE) / n))
        |          - CAST(sg AS DOUBLE) / n)
        |         / (sqrt(CAST(sg2 AS DOUBLE) / n
        |                 - (CAST(sg AS DOUBLE) / n)
        |                   * (CAST(sg AS DOUBLE) / n))
        |            + CAST(sg AS DOUBLE) / n) AS bv
        |  FROM pp)
        |SELECT lang, CAST(count(*) AS BIGINT) AS pair_ct,
        |       round(CAST(sum(CAST(round(bv, 6) AS DECIMAL(28,6)))
        |                  AS DOUBLE)
        |             / count(*), 6) AS avg_burstiness,
        |       round(CAST(sum(CASE WHEN bv > 0 THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / count(*), 6) AS bursty_share
        |FROM b GROUP BY 1""".stripMargin,
    "g4_posexplode_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(x.pos AS INT) AS pos, x.tok AS tok
        |FROM (SELECT doc_id, unnest(list_transform(
        |        range(1, len(toks) + 1),
        |        i -> {'pos': i - 1, 'tok': toks[i]})) AS x
        |      FROM t)""".stripMargin,
    "t7_length_quantiles" ->
      s"""WITH r AS (
         |  SELECT source, n_chars,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY n_chars, doc_id) AS rn,
         |         count(*) OVER (PARTITION BY source) AS n
         |  FROM documents)
         |SELECT source,
         |       ${pickSql(0.5)} AS p50,
         |       ${pickSql(0.9)} AS p90,
         |       ${pickSql(0.99)} AS p99,
         |       max(n) AS doc_ct
         |FROM r GROUP BY 1""".stripMargin,
    "t1_top_tokens" ->
      """SELECT word, count(*) AS word_ct
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY 1 ORDER BY word_ct DESC, word LIMIT 20""".stripMargin,
    "t2_token_stats" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS n_tokens,
        |       len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |       n_chars,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS distinct_ratio
        |FROM documents""".stripMargin,
    "t3_quality_score" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |m AS (SELECT doc_id,
         |        len(toks) AS n_tokens,
         |        len(list_filter(toks, x -> x IN (${inList(TextOps.enStops)}))) AS stop_ct,
         |        CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS BIGINT) AS char_sum
         |      FROM t)
         |SELECT doc_id, n_tokens, stop_ct, char_sum,
         |       CAST(stop_ct AS DOUBLE) / n_tokens AS stop_ratio,
         |       CAST(char_sum AS DOUBLE) / n_tokens AS avg_tok_len,
         |       (CAST(stop_ct AS DOUBLE) / n_tokens) * 0.3 +
         |         CAST(least(n_tokens, 100) AS DOUBLE) / 100.0 * 0.7 AS quality_score
         |FROM m""".stripMargin,
    "t4_lang_id" ->
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
         |h AS (SELECT lang,
         |        len(list_filter(toks, x -> x IN (${inList(TextOps.enStops)}))) AS en_hits,
         |        len(list_filter(toks, x -> x IN (${inList(TextOps.esStops)}))) AS es_hits,
         |        len(list_filter(toks, x -> x IN (${inList(TextOps.frStops)}))) AS fr_hits
         |      FROM t)
         |SELECT lang,
         |       CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
         |            WHEN es_hits >= fr_hits THEN 'es'
         |            ELSE 'fr' END AS predicted,
         |       count(*) AS doc_ct
         |FROM h GROUP BY 1, 2""".stripMargin,
    "t6_bpe_tokens" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS bpe_ct,
        |       len(string_split(text, ' ')) AS ws_ct,
        |       len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS bpe_distinct
        |FROM documents""".stripMargin,
    "t5_fingerprint_stats" ->
      """WITH f AS (SELECT source,
        |    md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT source, count(*) AS doc_ct,
        |       count(DISTINCT fp) AS distinct_ct,
        |       count(*) - count(DISTINCT fp) AS dup_ct
        |FROM f GROUP BY 1""".stripMargin)
}
