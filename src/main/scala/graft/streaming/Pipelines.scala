package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.Fns

/** End-to-end streaming pipelines: source → transform → multi-sink with
  * checkpointing (SURVEY.md §2.2 K1/K2/K4, §2.8 W10).
  *
  *  - [[dwdRouteSinks]]: the DwdBaseLog shape — one pass over the source
  *    splits into N routed sinks (page/start/err/action/display analog,
  *    DwdBaseLog.java:192-295 side outputs + FlinkSinkUtil.java:44-65
  *    dynamic topic). foreachBatch caches the micro-batch once and writes
  *    each filtered route — Spark's answer to side outputs; a per-row
  *    route column + partitionBy is the single-sink alternative (K2's
  *    topic column).
  *  - [[dwsWindowSink]]: the DWS Doris sink analog (FlinkSinkUtil.java:
  *    82-107) — watermarked 10 s window counts appended to parquet
  *    partitioned by cur_date, the Doris day-partition layout
  *    (par#{date} ≈ cur_date=...). Append mode + file sink + checkpoint
  *    = exactly-once (W10); serving queries prune on cur_date.
  *
  * Scale notes: foreachBatch writes are per-micro-batch parquet appends;
  * at cluster scale the same code targets Delta/Iceberg commits. The
  * route loop re-reads the cached batch (memory-deserialized) once per
  * route — N small scans of one cached batch beats N full source scans.
  */
object Pipelines {
  import Fns._

  val routes = Map("view" -> "page", "signup" -> "start", "error" -> "err",
    "click" -> "action", "purchase" -> "display")

  /** One streaming pass → five routed parquet sinks under outDir/<route>,
    * each partitioned by cur_date. Returns the started query. */
  def dwdRouteSinks(s: SparkSession, dir: String, outDir: String,
      checkpoint: String): StreamingQuery = {
    val src = StatefulStreams.eventStream(s, dir)
      .withColumn("cur_date", curDate(nsToSec(col("ts"))))
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try routes.foreach { case (eventType, route) =>
          batch.filter(col("event_type") === eventType)
            .write.mode("append")
            .partitionBy("cur_date")
            .parquet(s"$outDir/$route")
        } finally { batch.unpersist(); () }
      }
      .start()
  }

  /** K5: the DIM maintenance sink — apply a CDC op stream (upsert/delete
    * per key) into a keyed dim store, one merge per micro-batch
    * (HBaseSinkFunction.java:36-61; with a Delta/Iceberg table this is
    * MERGE INTO whenMatched.delete/update — parquet has no transactional
    * overwrite, so each batch commits a new version directory and readers
    * take the latest, the lakehouse commit protocol in miniature).
    * Op schema: (id LONG, op STRING in upsert|delete, payload DOUBLE,
    * seq LONG — total order of ops). */
  def dimMergeSink(s: SparkSession, ops: DataFrame, storeDir: String,
      checkpoint: String): StreamingQuery = {
    val sink = new VersionedParquetMergeSink(storeDir, "id", "seq", "op",
      Seq("payload"))
    ops.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink.merge(batch, batchId)
      }
      .start()
  }

  /** Latest committed version of a [[dimMergeSink]] store. */
  def dimStore(s: SparkSession, storeDir: String): DataFrame =
    new VersionedParquetMergeSink(storeDir, "id", "seq", "op",
      Seq("payload")).current(s)

  /** Watermarked 10 s window counts → day-partitioned parquet (append =
    * only closed windows are ever written, so the table is immutable —
    * the upsert-free Doris replacement). */
  def dwsWindowSink(s: SparkSession, dir: String, outDir: String,
      checkpoint: String): StreamingQuery =
    StatefulStreams.windowedCounts(s, dir)
      .withColumn("cur_date", substring(col("stt"), 1, 10))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .partitionBy("cur_date")
      .format("parquet")
      .option("path", outDir)
      .start()
}
