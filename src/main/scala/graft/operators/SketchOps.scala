package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}
import graft.functions.CmsSketch

/** Sketch-backed frequency analysis and retrieval-prep chunking over the
  * documents corpus — beyond-reference training-data operators.
  *
  * Scale notes (100 TB):
  *  - t17's counter matrix is d×w = 4×256 cells total, REGARDLESS of
  *    vocabulary size: the token shuffle is the same one t1's top-k
  *    already pays, and everything after it is bounded by the sketch
  *    dimensions. The mergeable Aggregator form ([[CmsSketch]]) folds
  *    each partition into a local 8 KB matrix and merges by elementwise
  *    sum — no vocab-sized state anywhere, which is the point of a
  *    sketch at corpus scale (spec-proven equal to the declarative
  *    bucket-sum matrix, which is what the oracle replays).
  *  - c13 chunking is a pure per-document fan-out (sequence + explode —
  *    one Generate, no shuffle at all until a consumer aggregates);
  *    chunk fingerprints are md5 over the token slice, so downstream
  *    chunk-level dedup is an exact-dedup groupBy away. At 100 TB this
  *    is the RAG/embedding-prep pass: map-side only, output partitioned
  *    by the same doc_id the corpus is already keyed on.
  */
object SketchOps extends QueryModule {

  // ---- t17: count-min heavy hitters --------------------------------------

  /** CMS bucket of a token for sketch row `i` — the SQL twin of
    * [[CmsSketch.bucket]] (same md5-prefix hash, same width). */
  private[graft] def bucketCol(i: Column, tok: Column): Column =
    conv(substring(md5(concat_ws(":", i, tok)), 1, 8), 16, 10)
      .cast(LongType) % CmsSketch.width

  /** t17: heavy hitters with count-min estimates. True per-token counts
    * (one token shuffle), the d×w counter matrix as d bucketed group-bys
    * over those counts (what a CMS row IS), then the top-20 tokens by
    * true count with their sketch estimates — demonstrating the
    * `est ≥ true` one-sided contract the driver's oracle re-derives. */
  private def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(TextOps.tokenize(lower(col("text"))), t => t =!= "")
    val tokCt = Tables(s, dir, "documents")
      .select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("true_ct"))
    val withBucket = tokCt
      .select(col("tok"), col("true_ct"),
        explode(sequence(lit(0), lit(CmsSketch.depth - 1))).as("i"))
      .withColumn("bucket", bucketCol(col("i"), col("tok")))
    val counters = withBucket.groupBy(col("i"), col("bucket"))
      .agg(sum(col("true_ct")).as("bsum"))
    withBucket.join(counters, Seq("i", "bucket"))
      .groupBy(col("tok"), col("true_ct"))
      .agg(min(col("bsum")).as("cms_est"))
      .orderBy(col("true_ct").desc, col("tok"))
      .limit(20)
      .select(col("tok").as("token"), col("true_ct"), col("cms_est"),
        (col("cms_est") >= col("true_ct")).as("one_sided_ok"))
  }

  // ---- c13: RAG chunking -------------------------------------------------

  val chunkSize = 128L
  val chunkStride = 96L

  /** c13: retrieval-prep document chunking — fixed 128-token windows with
    * 32-token overlap (stride 96), the standard RAG/embedding input
    * shape. Each chunk row carries its token range and an md5 content
    * fingerprint of the exact token slice (chunk-level exact dedup and
    * provenance both hang off it). Pure map-side fan-out: sequence +
    * explode, no shuffle. */
  /** Generic chunk fan-out for an arbitrary (doc_id, text) frame — the
    * form behind c13 and the [[graft.api.Graft]] facade. */
  private[graft] def chunksFor(docs: DataFrame, size: Long,
      stride: Long): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride " +
        "(stride > size would skip tokens; non-positive values blow up " +
        "the sequence fan-out)")
    val toks = filter(TextOps.tokenize(lower(col("text"))), t => t =!= "")
    val d = docs
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("t"))
        .cast(LongType))
      .filter(col("n") > 0)
      .withColumn("n_chunks",
        when(col("n") <= size, lit(1L)).otherwise(
          expr(s"(n - $size + ${stride - 1}) div $stride") + 1L))
    d.select(col("doc_id"), col("n"), col("t"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_len", least(lit(size), col("n") - col("tok_start")))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"),
        col("tok_len"),
        md5(concat_ws(" ",
          slice(col("t"), (col("tok_start") + 1L).cast(IntegerType),
            col("tok_len").cast(IntegerType)))).as("chunk_fp"))
  }

  private def ragChunks(s: SparkSession, dir: String): DataFrame =
    chunksFor(Tables(s, dir, "documents"), chunkSize, chunkStride)

  // ---- a26: histogram percentile sketch ----------------------------------

  /** a26: percentile estimation from a mergeable equi-width histogram —
    * p50/p95/p99 of order value per priority, computed as the
    * declarative twin of [[graft.functions.HistogramSketch]]: bin
    * counts are one map-side-combinable (priority, bin) group-by, the
    * cumulative pass is one tiny window over ≤ 60 rows per group, and
    * the estimate is the lower bound of the first bin whose cumulative
    * count reaches ceil(q·n) — integer-only rank logic (cum·den ≥
    * num·n), engine-exact. The shuffle is bounded by groups × bins no
    * matter the row count — the whole point of a histogram sketch at
    * 100 TB (exact percentiles need a full sort; t7's rank form pays
    * it, this never does). The Aggregator form is spec-proven
    * bin-identical and powers the streaming-window variant. */
  private def histPercentiles(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HistogramSketch.{binWidth, numBins}
    val bins = Tables(s, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        least(greatest(floor(col("o_totalprice") / binWidth), lit(0)),
          lit(numBins - 1)).cast(LongType).as("bin"))
      .groupBy(col("priority"), col("bin"))
      .agg(count(lit(1)).as("ct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("priority")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("priority"))
    val lo = (c: Column) => (c * binWidth.toLong).cast(LongType)
    bins
      .withColumn("cum", sum(col("ct")).over(w))
      .withColumn("n", sum(col("ct")).over(wAll))
      .groupBy(col("priority"))
      .agg(max(col("n")).as("n"),
        lo(min(when(col("cum") * 2L >= col("n"), col("bin"))))
          .as("p50_lo"),
        lo(min(when(col("cum") * 20L >= col("n") * 19L, col("bin"))))
          .as("p95_lo"),
        lo(min(when(col("cum") * 100L >= col("n") * 99L, col("bin"))))
          .as("p99_lo"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "t17_cms_heavy_hitters" -> cmsHeavyHitters,
    "a26_hist_percentiles" -> histPercentiles,
    "c13_rag_chunks" -> ragChunks)

  val oracles = Map(
    "a26_hist_percentiles" -> {
      import graft.functions.HistogramSketch.{binWidth, numBins}
      val bw = binWidth.toLong
      s"""WITH bins AS (
         |  SELECT o_orderpriority AS priority,
         |         least(greatest(CAST(floor(o_totalprice / $binWidth)
         |                             AS BIGINT), 0),
         |               ${numBins - 1}) AS bin,
         |         CAST(count(*) AS BIGINT) AS ct
         |  FROM orders GROUP BY 1, 2),
         |c AS (
         |  SELECT priority, bin, ct,
         |         sum(ct) OVER (PARTITION BY priority ORDER BY bin
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS cum,
         |         sum(ct) OVER (PARTITION BY priority) AS n
         |  FROM bins)
         |SELECT priority, CAST(max(n) AS BIGINT) AS n,
         |       CAST(min(CASE WHEN cum * 2 >= n THEN bin END) * $bw
         |            AS BIGINT) AS p50_lo,
         |       CAST(min(CASE WHEN cum * 20 >= n * 19 THEN bin END) * $bw
         |            AS BIGINT) AS p95_lo,
         |       CAST(min(CASE WHEN cum * 100 >= n * 99 THEN bin END) * $bw
         |            AS BIGINT) AS p99_lo
         |FROM c GROUP BY 1""".stripMargin
    },
    "t17_cms_heavy_hitters" -> {
      // NB: the alias must NOT be `i` — hexToIntSql's list_transform
      // lambda variable is `i` and would shadow it inside md5(...).
      val b = DedupOps.hexToIntSql("CAST(r AS VARCHAR) || ':' || tok")
      s"""WITH tc AS (
         |  SELECT tok, count(*) AS true_ct FROM (
         |    SELECT unnest(list_filter(string_split(lower(text), ' '),
         |                              x -> x <> '')) AS tok
         |    FROM documents) GROUP BY 1),
         |wb AS (
         |  SELECT tok, true_ct, r AS i, ($b) % ${CmsSketch.width} AS bucket
         |  FROM tc CROSS JOIN range(0, ${CmsSketch.depth}) t(r)),
         |cnt AS (
         |  SELECT i, bucket, CAST(sum(true_ct) AS BIGINT) AS bsum
         |  FROM wb GROUP BY 1, 2)
         |SELECT tok AS token, true_ct, CAST(min(bsum) AS BIGINT) AS cms_est,
         |       min(bsum) >= true_ct AS one_sided_ok
         |FROM wb JOIN cnt USING (i, bucket)
         |GROUP BY tok, true_ct
         |ORDER BY true_ct DESC, tok LIMIT 20""".stripMargin
    },
    "c13_rag_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |         list_filter(string_split(lower(text), ' '),
         |                     x -> x <> '') AS t
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
         |         CASE WHEN len(t) <= $chunkSize THEN 1
         |              ELSE (len(t) - $chunkSize + ${chunkStride - 1})
         |                   // $chunkStride + 1 END AS n_chunks
         |  FROM d WHERE len(t) > 0),
         |c AS (
         |  SELECT doc_id, n, t,
         |         unnest(range(0, n_chunks)) AS chunk_idx
         |  FROM n)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(chunk_idx * $chunkStride AS BIGINT) AS tok_start,
         |       CAST(least($chunkSize, n - chunk_idx * $chunkStride)
         |            AS BIGINT) AS tok_len,
         |       md5(array_to_string(
         |         t[CAST(chunk_idx * $chunkStride + 1 AS BIGINT):
         |           CAST(chunk_idx * $chunkStride +
         |                least($chunkSize, n - chunk_idx * $chunkStride)
         |                AS BIGINT)], ' ')) AS chunk_fp
         |FROM c""".stripMargin)
}
