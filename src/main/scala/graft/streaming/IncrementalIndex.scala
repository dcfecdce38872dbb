package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.operators.VectorOps

/** Incremental ANN-index maintenance — the serving-side sibling of
  * [[IncrementalDedup]]: as new embeddings arrive, they are routed to
  * their coarse cell and PQ-encoded against the FROZEN index artifacts
  * (centroids + residual codebook trained on the initial corpus), then
  * appended to the inverted-list store. This is how production IVFPQ
  * deployments actually grow (FAISS `add` after `train`): re-training
  * the quantizers per batch would invalidate every stored code, so the
  * artifacts are versioned and immutable between index rebuilds, and
  * each arriving batch pays ONLY its own assignment cost —
  * |batch| × (k centroids + codebook) map-side work against broadcast
  * artifacts, shuffle bounded by one row per new vector.
  *
  * IncrementalIndexSpec proves the accumulated store over streamed
  * batches is row-identical to the one-shot batch encoding
  * ([[VectorOps.ivfpqCodes]] — the v21 code table), so a query served
  * from the incrementally-grown index sees exactly the index a full
  * rebuild would produce. */
object IncrementalIndex {

  /** Frozen serving artifacts, built once from the initial corpus (the
    * `train` step). Both frames are small (k cells, 64 codewords) —
    * broadcast to every encode. `meanAssignD2` records the training
    * corpus's mean squared cell-assignment distance — the yardstick
    * [[fold]]'s drift gate measures arriving batches against (NaN =
    * ungated, for artifacts built before the gate existed). */
  final case class Artifacts(centroids: DataFrame, codebook: DataFrame,
      meanAssignD2: Double = Double.NaN)

  /** DECIMAL-quantized mean squared assignment distance of an assigned
    * frame — partition-order independent, so the drift gate is
    * deterministic. */
  private def meanD2(assigned: DataFrame): Double = {
    import org.apache.spark.sql.types.DecimalType
    val r = assigned.agg(
      (sum(round(VectorOps.dot(col("resid"), col("resid")), 9)
        .cast(DecimalType(28, 9))).cast(DoubleType) /
        count(lit(1))).as("m")).head
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  def train(s: SparkSession, dir: String): Artifacts =
    trainOn(VectorOps.embFrame(s, dir))

  /** Train the frozen artifacts on an arbitrary (vec_id, emb
    * ARRAY<DOUBLE>) corpus frame — the initial-corpus step of a grown
    * deployment (v25 trains on the pre-append corpus). */
  def trainOn(em: DataFrame): Artifacts = {
    val cent = VectorOps.coarseCentroids(em)
    artifactsFrom(cent, VectorOps.cellResiduals(em, cent))
  }

  /** Build the artifacts from an ALREADY-COMPUTED assignment — lets a
    * caller that also needs the assigned frame (codebook + yardstick
    * + code table all read it) pay the corpus assignment ONCE. */
  private[graft] def artifactsFrom(cent: DataFrame,
      assigned: DataFrame): Artifacts =
    Artifacts(cent, VectorOps.residualCodebook(assigned),
      meanD2(assigned))

  /** Drift-gated BATCH fold — the append-only maintenance path for the
    * memoized batch index ([[VectorOps.ivfpqCodes]]'s shape): encode
    * one arriving batch against the FROZEN artifacts and return
    * `stored ∪ encoded`, exactly the code table a one-shot encode of
    * the grown corpus against the same artifacts would produce
    * (assignment is per-vector, so fold == rebuild-with-frozen-
    * artifacts row-for-row — IncrementalIndexSpec asserts it). At
    * 100 TB this is the daily loop: |batch| map-side work against
    * broadcast artifacts instead of a full-corpus re-encode.
    *
    * The gate: when the batch's mean squared assignment distance
    * exceeds `driftFactor ×` the training mean, the quantizers no
    * longer fit the arriving distribution — folding would accumulate
    * badly-quantized codes that silently degrade recall (the v13/v22
    * drift signals made a hard precondition). The fold REFUSES with
    * rebuild advice; nothing is mutated. */
  def fold(stored: DataFrame, batch: DataFrame, art: Artifacts,
      driftFactor: Double = 4.0): DataFrame = {
    val em = batch.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("emb"))
    val assigned = VectorOps.cellResiduals(em, art.centroids)
    if (!art.meanAssignD2.isNaN) {
      val batchMean = meanD2(assigned)
      if (batchMean > driftFactor * art.meanAssignD2)
        throw new IllegalStateException(
          "index fold refused: the arriving batch's mean squared " +
            f"cell-assignment distance ($batchMean%.3f) exceeds " +
            f"$driftFactor%.1f x the training mean " +
            f"(${art.meanAssignD2}%.3f) - the frozen quantizers no " +
            "longer fit the arriving distribution and folded codes " +
            "would silently degrade recall; re-train " +
            "(IncrementalIndex.train) and re-encode the corpus, then " +
            "resume folding against the new artifacts")
    }
    stored.unionByName(VectorOps.pqEncode(assigned, art.codebook))
  }

  /** Encode one arriving batch (vec_id, embedding ARRAY<FLOAT|DOUBLE>)
    * against the frozen artifacts → (vec_id, c_id, code0..codeM). */
  def encodeBatch(batch: DataFrame, art: Artifacts): DataFrame = {
    val em = batch.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("emb"))
    VectorOps.pqEncode(
      VectorOps.cellResiduals(em, art.centroids), art.codebook)
  }

  /** The foreachBatch pipeline: embeddings stream → encode against the
    * frozen artifacts → append to the inverted-list store. Idempotent
    * per batch id is the checkpoint's job (W10 pattern, same as every
    * other sink here). */
  def run(stream: DataFrame, art: Artifacts, storeDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        encodeBatch(batch, art)
          .write.mode("append").parquet(storeDir)
        ()
      }
      .start()
}
