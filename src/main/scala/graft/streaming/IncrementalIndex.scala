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
    * broadcast to every encode. */
  final case class Artifacts(centroids: DataFrame, codebook: DataFrame)

  def train(s: SparkSession, dir: String): Artifacts = {
    val em = VectorOps.embFrame(s, dir)
    val cent = VectorOps.coarseCentroids(em)
    Artifacts(cent,
      VectorOps.residualCodebook(VectorOps.cellResiduals(em, cent)))
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
