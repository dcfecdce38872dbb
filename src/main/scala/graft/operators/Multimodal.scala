package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}

/** Multimodal column plumbing: media payloads ride as opaque BINARY
  * columns with a typed metadata struct, batched through partition-local
  * decode/feature-extract operators.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container
  * has no media libraries — behind [[MediaCodec.decodeStub]], a
  * deterministic fake. Everything Spark-side is real and tested: schema,
  * binary column handling, partition-wise batching (mapPartitions — the
  * Scala-native shape of mapInPandas: one iterator per partition, so a
  * codec can amortize per-batch model/codec setup), and the metadata
  * aggregation pushdown.
  *
  * Scale notes: media blobs dominate bytes at 100 TB, so (1) metadata
  * queries must never deserialize payloads — m1 reads only computed
  * lengths/struct fields and Parquet column pruning drops the blob pages;
  * (2) decode runs mapPartitions with no shuffle of raw bytes; any
  * downstream agg shuffles only extracted features.
  */
object Multimodal extends QueryModule {

  /** Typed media row: payload + metadata struct. */
  case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
    n_bytes: Long)
  case class MediaFeature(doc_id: Long, format: String, feat_dim: Int,
    checksum: Long)

  object MediaCodec {
    /** STUB: stands in for a real image/audio decoder (no codec libs in
      * this container). Deterministic: derives a fixed-length "feature"
      * from the payload bytes so tests are reproducible. A real deploy
      * swaps only this function. */
    def decodeStub(payload: Array[Byte]): MediaFeature = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      MediaFeature(-1, "", 16, sum)
    }

    /** STUB resize: a real implementation re-encodes pixels; the stub
      * truncates/pads the payload to the target byte budget — shape and
      * determinism are what the pipeline contract needs. */
    def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, targetBytes)

    /** STUB frame sampling: split the payload into n evenly-spaced
      * "frames" (a video decoder would seek keyframes; the slicing,
      * array-of-binary schema, and explode path are the real plumbing). */
    def frameSampleStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val len = math.max(1, payload.length / n)
      (0 until n).map { i =>
        val from = math.min(i * len, payload.length)
        val until = math.min(from + len, payload.length)
        java.util.Arrays.copyOfRange(payload, from, until)
      }
    }
  }

  /** Documents → media table: text bytes play the opaque payload. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      col("text").cast(BinaryType).as("media"),
      concat(lit("fake/"), col("lang")).as("format"),
      length(col("text").cast(BinaryType)).cast(LongType).as("n_bytes"))

  /** Partition-local decode: the mapInPandas-shaped batch operator —
    * rows flow in fixed-size batches (the Arrow record-batch shape), so a
    * real codec amortizes per-batch setup exactly like a Pandas UDF. */
  val DECODE_BATCH = 128

  def decodeFeatures(s: SparkSession, dir: String): Dataset[MediaFeature] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { it =>
      // per-partition codec setup would happen here (amortized), then
      // per-batch invocation over DECODE_BATCH-row slices
      it.grouped(DECODE_BATCH).flatMap { batch =>
        batch.map { row =>
          val f = MediaCodec.decodeStub(row.media)
          f.copy(doc_id = row.doc_id, format = row.format)
        }
      }
    }
  }

  case class Frame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** Frame sampling as a generator-shaped partition operator: one media
    * row fans out to n frame rows (binary each) — the video analog of G1.
    */
  def sampleFrames(s: SparkSession, dir: String, n: Int): Dataset[Frame] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        MediaCodec.frameSampleStub(row.media, n).zipWithIndex.map {
          case (bytes, i) => Frame(row.doc_id, i, bytes)
        }
      }
    }
  }

  /** Audio chunk geometry (Whisper-style strided inference windows): a
    * payload of L bytes (1 byte ≈ 1 ms at the stub's "sample rate")
    * yields ceil(L / hop) windows, window k covering
    * [k·hop, min(k·hop + win, L)) — consecutive windows OVERLAP by
    * win − hop bytes so no boundary context is lost. A real deploy
    * swaps the byte slicing for codec frame extraction; the chunk
    * count/offset/overlap arithmetic — what the pipeline's cost model
    * and the downstream transcript-stitching depend on — is the real,
    * oracle-checked plumbing. */
  val audioWin = 100
  val audioHop = 60

  case class AudioChunk(doc_id: Long, format: String, chunk_no: Int,
    chunk: Array[Byte])

  def chunkAudio(s: SparkSession, dir: String): Dataset[AudioChunk] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        val L = row.media.length
        (0 until math.max(L, 1) by audioHop).zipWithIndex.map {
          case (s0, k) => AudioChunk(row.doc_id, row.format, k,
            java.util.Arrays.copyOfRange(row.media, s0,
              math.min(s0 + audioWin, L)))
        }
      }
    }
  }

  /** m5: strided audio-window statistics — the overlapping-chunk
    * geometry audit (vs m2's disjoint frame sampling): per format, how
    * many windows the corpus fans out to and how many EXTRA bytes the
    * overlap re-reads (out_bytes − in_bytes = the stitching overhead a
    * serving cost model budgets for). Payload bytes never shuffle —
    * the fan-out is partition-local and only window LENGTHS reach the
    * aggregation. */
  private def audioChunkStats(s: SparkSession, dir: String): DataFrame = {
    val perFormat = chunkAudio(s, dir).toDF()
      .select(col("format"),
        length(col("chunk")).cast(LongType).as("cbytes"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("chunk_ct"), sum(col("cbytes")).as("out_bytes"))
    val inBytes = mediaTable(s, dir)
      .groupBy(col("format").as("f2"))
      .agg(count(lit(1)).as("media_ct"), sum(col("n_bytes")).as("in_bytes"))
    perFormat.join(inBytes, col("format") === col("f2"))
      .select(col("format"), col("media_ct"), col("chunk_ct"),
        col("in_bytes"), col("out_bytes"),
        (col("out_bytes") - col("in_bytes")).as("overlap_bytes"))
  }

  /** m1: metadata-only aggregation — must not touch payload bytes (the
    * blob column is pruned out of the parquet scan). */
  private def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy(col("format"))
      .agg(count(lit(1)).as("media_ct"),
        sum(col("n_bytes")).as("byte_sum"),
        max(col("n_bytes")).as("byte_max"))

  /** m2: frame-sampling statistics — the generator-shaped mapPartitions
    * fan-out (one media row → 4 binary frames) aggregated per frame slot.
    * The oracle restates the stub's integer slicing arithmetic over the
    * byte lengths alone, proving the partition operator's frame geometry
    * without an engine-side codec. */
  private def frameStats(s: SparkSession, dir: String): DataFrame =
    sampleFrames(s, dir, 4).toDF()
      .select(col("frame_no"),
        length(col("frame")).cast(LongType).as("fbytes"))
      .groupBy(col("frame_no"))
      .agg(count(lit(1)).as("frame_ct"), sum(col("fbytes")).as("byte_sum"))

  /** m3: frame-level media near-dup — the video-dedup pass of a training
    * pipeline: per media item, hash each sampled frame; block on
    * (frame_no, frame_hash) so only colliding frames join; count shared
    * frames per pair; keep pairs sharing ≥ 2 of 4. The fixture plants
    * what a crawl actually contains — exact re-uploads (same payload,
    * new id, +1e9) and tail-edited variants (last quarter overwritten,
    * +2e9) — so the expected pair set is analytic: re-uploads share 4
    * frames, tail edits 3, and single-frame accidents (the shared
    * blanked tail between two variants) fall below the threshold.
    *
    * Scale: the join is blocked by frame hash — never media×media; the
    * shuffle key is the hash space, uniform by construction. Frames ride
    * as hashes (16 bytes) — payload bytes are never shuffled, the same
    * contract as m1/m2. */
  private def frameNearDup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val withGeom = (df: DataFrame) => df
      .withColumn("L", length(col("text")).cast(LongType))
      .withColumn("flen", greatest(expr("L div 4"), lit(1L)))
    val copies = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val partials = withGeom(base.filter(col("doc_id") % 15 === 0))
      .select((col("doc_id") + 2000000000L).as("doc_id"),
        expr("concat(substring(text, 1, CAST(3 * flen AS INT))," +
          " repeat('x', CAST(L - 3 * flen AS INT)))").as("text"))
    val media = withGeom(base.unionByName(copies).unionByName(partials))
    val frames = media
      .select(col("doc_id"), col("text"), col("L"), col("flen"),
        explode(sequence(lit(0L), lit(3L))).as("frame_no"))
      .withColumn("ffrom", least(col("frame_no") * col("flen"), col("L")))
      .withColumn("fl2",
        least(col("ffrom") + col("flen"), col("L")) - col("ffrom"))
      .filter(col("fl2") > 0)
      .select(col("doc_id"), col("frame_no"),
        md5(expr("substring(text, CAST(ffrom + 1 AS INT), " +
          "CAST(fl2 AS INT))")).as("fhash"))
    val a = frames.select(col("doc_id").as("a_id"),
      col("frame_no").as("a_no"), col("fhash").as("a_hash"))
    val b = frames.select(col("doc_id").as("b_id"),
      col("frame_no").as("b_no"), col("fhash").as("b_hash"))
    a.join(b, col("a_hash") === col("b_hash") &&
        col("a_no") === col("b_no") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_ct"))
      .filter(col("shared_ct") >= 2)
  }

  /** m6 (beyond-reference): video scene-cut detection — the shot
    * segmentation every video-training pipeline runs before sampling
    * clips: sample 8 frames per media item, derive a per-frame
    * brightness scalar, and declare a cut wherever consecutive frames
    * jump by more than the threshold; scenes = cuts + 1. The
    * "brightness" is the deterministic stub feature (md5-uniform of the
    * frame bytes — a real deploy swaps in mean luminance from the
    * decoder); the cut rule, the per-media ordered window, and the
    * shot-length accounting are the real, oracle-checked plumbing.
    * Output is the corpus shot-structure distribution (O(frames/media)
    * rows), not per-media detail. Shuffles: one doc-keyed window + the
    * distribution rollup; payload bytes never shuffle (hashes do). */
  val sceneFrames = 8
  val sceneCutThreshold = 64L

  private def sceneCuts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast(LongType).as("L"))
      .withColumn("flen", greatest(expr(s"L div $sceneFrames"), lit(1L)))
      .select(col("doc_id"), col("text"), col("L"), col("flen"),
        explode(sequence(lit(0L), lit(sceneFrames - 1L))).as("frame_no"))
      .withColumn("ffrom", least(col("frame_no") * col("flen"), col("L")))
      .withColumn("fl2",
        least(col("ffrom") + col("flen"), col("L")) - col("ffrom"))
      .filter(col("fl2") > 0)
      .select(col("doc_id"), col("frame_no"),
        pmod(graft.functions.Fns.hex4(
          expr("substring(text, CAST(ffrom + 1 AS INT), CAST(fl2 AS INT))")),
          lit(256L)).as("bright"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val perMedia = frames
      .withColumn("prev", lag(col("bright"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("frame_ct"),
        sum(when(col("prev").isNotNull &&
          abs(col("bright") - col("prev")) > sceneCutThreshold, 1L)
          .otherwise(0L)).as("cut_ct"))
      .withColumn("scene_ct", col("cut_ct") + 1L)
    perMedia.groupBy(col("scene_ct"))
      .agg(count(lit(1)).as("media_ct"),
        round(avg(col("frame_ct").cast(DoubleType) / col("scene_ct")), 6)
          .as("avg_shot_frames"))
  }

  /** m4: the resize/transcode pass — every payload brought under a fixed
    * byte budget through the partition-local [[MediaCodec.resizeStub]]
    * (a real deploy swaps the stub for a pixel re-encoder; the batching,
    * binary plumbing and savings accounting are the contract). Savings
    * are summarized per format; the oracle restates the stub's
    * truncate-to-budget arithmetic over the byte lengths alone. */
  val RESIZE_BUDGET = 256

  private def resizeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val resized = mediaTable(s, dir).as[MediaRow].mapPartitions { it =>
      it.grouped(DECODE_BATCH).flatMap { batch =>
        batch.map { row =>
          val out = MediaCodec.resizeStub(row.media,
            math.min(row.n_bytes.toInt, RESIZE_BUDGET))
          (row.doc_id, row.format, row.n_bytes, out.length.toLong)
        }
      }
    }.toDF("doc_id", "format", "n_bytes", "out_bytes")
    resized.groupBy(col("format"))
      .agg(count(lit(1)).as("media_ct"),
        sum(col("n_bytes")).as("in_bytes"),
        sum(col("out_bytes")).as("out_bytes"),
        sum(when(col("n_bytes") > col("out_bytes"), 1L).otherwise(0L))
          .as("shrunk_ct"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "m1_media_meta" -> mediaMeta,
    "m3_frame_near_dup" -> frameNearDup,
    "m4_resize_stats" -> resizeStats,
    "m5_audio_chunk_stats" -> audioChunkStats,
    "m2_frame_stats" -> frameStats,
    "m6_scene_cuts" -> sceneCuts)

  val oracles = Map(
    "m6_scene_cuts" -> {
      val bright = graft.functions.Oracle.hex4(
        "substr(text, CAST(ffrom + 1 AS INT), CAST(fl2 AS INT))")
      s"""WITH g AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L,
         |         greatest(CAST(length(text) AS BIGINT) // $sceneFrames,
         |                  1) AS flen
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, i AS frame_no,
         |         least(i * flen, L) AS ffrom,
         |         least(least(i * flen, L) + flen, L)
         |           - least(i * flen, L) AS fl2,
         |         text
         |  FROM g, unnest(range(0, $sceneFrames)) AS u(i)),
         |b AS (
         |  SELECT doc_id, frame_no, ($bright) % 256 AS bright
         |  FROM f WHERE fl2 > 0),
         |d AS (
         |  SELECT doc_id, bright,
         |         lag(bright) OVER (PARTITION BY doc_id ORDER BY frame_no)
         |           AS prev
         |  FROM b),
         |pm AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS frame_ct,
         |         CAST(sum(CASE WHEN prev IS NOT NULL AND
         |                  abs(bright - prev) > $sceneCutThreshold
         |                  THEN 1 ELSE 0 END) + 1 AS BIGINT) AS scene_ct
         |  FROM d GROUP BY 1)
         |SELECT scene_ct, CAST(count(*) AS BIGINT) AS media_ct,
         |       round(avg(CAST(frame_ct AS DOUBLE) / scene_ct), 6)
         |         AS avg_shot_frames
         |FROM pm GROUP BY 1""".stripMargin
    },
    // Analytic expectation of the planted fixture: re-uploads share all
    // 4 frames, tail-edited variants share the first 3 (with the base
    // AND with the base's re-upload when both exist, doc_id % 30 = 0);
    // everything else collides on at most one frame and is thresholded.
    // replays the ACTUAL frame-blocking join (planted copies/partials
    // plus any organic raw-identical documents — at larger SF the
    // corpus genuinely contains docs sharing frames, which an
    // analytic planted-pairs-only statement would miss)
    "m3_frame_near_dup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |copies AS (
        |  SELECT doc_id + 1000000000 AS doc_id, text
        |  FROM base WHERE doc_id % 10 = 0),
        |partials AS (
        |  SELECT doc_id + 2000000000 AS doc_id,
        |         substr(text, 1,
        |                CAST(3 * greatest(length(text) // 4, 1) AS BIGINT))
        |         || repeat('x', CAST(length(text)
        |                - 3 * greatest(length(text) // 4, 1) AS BIGINT))
        |           AS text
        |  FROM base WHERE doc_id % 15 = 0),
        |media AS (
        |  SELECT * FROM base UNION ALL
        |  SELECT * FROM copies UNION ALL
        |  SELECT * FROM partials),
        |g AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L,
        |         greatest(CAST(length(text) AS BIGINT) // 4, 1) AS flen
        |  FROM media),
        |fr AS (
        |  SELECT doc_id, text, L, flen,
        |         unnest(range(0, 4)) AS frame_no
        |  FROM g),
        |fx AS (
        |  SELECT doc_id, frame_no,
        |         least(frame_no * flen, L) AS ffrom,
        |         least(least(frame_no * flen, L) + flen, L)
        |           - least(frame_no * flen, L) AS fl2,
        |         text
        |  FROM fr),
        |f2 AS (
        |  SELECT doc_id, frame_no,
        |         md5(substr(text, CAST(ffrom + 1 AS BIGINT),
        |                    CAST(fl2 AS BIGINT))) AS fhash
        |  FROM fx WHERE fl2 > 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       CAST(count(*) AS BIGINT) AS shared_ct
        |FROM f2 a JOIN f2 b
        |  ON a.fhash = b.fhash AND a.frame_no = b.frame_no
        | AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "m4_resize_stats" ->
      """WITH m AS (SELECT 'fake/' || lang AS format,
        |             octet_length(CAST(text AS BLOB)) AS L
        |           FROM documents)
        |SELECT format, count(*) AS media_ct,
        |       CAST(SUM(L) AS BIGINT) AS in_bytes,
        |       CAST(SUM(least(L, 256)) AS BIGINT) AS out_bytes,
        |       CAST(SUM(CASE WHEN L > 256 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS shrunk_ct
        |FROM m GROUP BY 1""".stripMargin,
    "m1_media_meta" ->
      """SELECT 'fake/' || lang AS format, count(*) AS media_ct,
        |       CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS byte_sum,
        |       CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS byte_max
        |FROM documents GROUP BY 1""".stripMargin,
    // strided windows over a payload of L bytes: ceil(L/hop) windows,
    // window k covering [k*hop, min(k*hop + win, L)) — the oracle
    // restates the slicing arithmetic over lengths alone (like m2)
    "m5_audio_chunk_stats" ->
      s"""WITH m AS (SELECT doc_id, 'fake/' || lang AS format,
         |             octet_length(CAST(text AS BLOB)) AS L
         |           FROM documents),
         |c AS (SELECT format, L,
         |             greatest((L + $audioHop - 1) // $audioHop, 1)
         |               AS nchunks
         |      FROM m),
         |ch AS (SELECT format, L, unnest(range(0, nchunks)) AS k FROM c),
         |agg AS (
         |  SELECT format, count(*) AS chunk_ct,
         |         CAST(SUM(least($audioWin, L - k * $audioHop))
         |              AS BIGINT) AS out_bytes
         |  FROM ch GROUP BY 1),
         |inb AS (SELECT format, count(*) AS media_ct,
         |               CAST(SUM(L) AS BIGINT) AS in_bytes
         |        FROM m GROUP BY 1)
         |SELECT agg.format, media_ct, chunk_ct, in_bytes, out_bytes,
         |       out_bytes - in_bytes AS overlap_bytes
         |FROM agg JOIN inb ON agg.format = inb.format""".stripMargin,
    // frame i of a payload of L bytes: len = greatest(L // 4, 1),
    // from = least(i*len, L), until = least(from + len, L)
    "m2_frame_stats" ->
      """WITH m AS (SELECT octet_length(CAST(text AS BLOB)) AS L
        |           FROM documents),
        |f AS (SELECT L, greatest(L // 4, 1) AS flen FROM m),
        |fr AS (SELECT unnest(range(0, 4)) AS frame_no, L, flen FROM f)
        |SELECT CAST(frame_no AS INT) AS frame_no, count(*) AS frame_ct,
        |       CAST(SUM(least(least(frame_no * flen, L) + flen, L)
        |                - least(frame_no * flen, L)) AS BIGINT) AS byte_sum
        |FROM fr GROUP BY 1""".stripMargin)
}
