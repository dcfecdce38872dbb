package graft.streaming

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The Kafka wire-format seam (FlinkSourceUtil.java:23-58 source /
  * FlinkSinkUtil.java:27-65 sink). A real deployment reads
  * `spark.readStream.format("kafka")`, which yields the fixed wire
  * schema (key BINARY, value BINARY, topic, partition, offset,
  * timestamp, timestampType); this sandbox has no broker, so the file
  * streams stand in — and the ONLY difference is `format("kafka")` plus
  * these two adapters. StreamingSpec drives KeywordApp through a
  * kafka-wire-shaped MemoryStream and asserts output identical to the
  * file-stream path, proving the swap is schema-deep only. */
object KafkaSeam {

  /** Kafka source → typed rows: cast value bytes to string, parse JSON
    * with an EXPLICIT schema (never inference — fixed scan schema at
    * 100 TB), lift the struct. The SimpleStringSchema + JSONObject parse
    * of FlinkSourceUtil, as one codegen'd projection. */
  def fromKafka(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value").cast("string"), schema).as("e"))
      .select("e.*")

  /** Typed rows → kafka sink wire shape: key = keyExpr bytes (the
    * partitioning key), value = JSON of the whole row
    * (KafkaRecordSerializationSchema + BeanToJsonStrMapFunction). */
  def toKafka(df: DataFrame, keyExpr: Column): DataFrame =
    df.select(keyExpr.cast("string").cast("binary").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*))
        .cast("binary").as("value"))

  /** CDC wire form (the topic_db path DimApp/BaseDbApp consume —
    * BaseSQLApp.java:55-68 / FlinkSourceUtil.java:23-58): Maxwell and
    * Debezium publish the envelope JSON as the message BODY, so the
    * record value is the raw envelope bytes (no re-wrapping) and the key
    * carries the source row's PK for partition affinity. */
  def envelopeToKafka(envs: DataFrame, keyExpr: Column): DataFrame =
    envs.select(keyExpr.cast("string").cast("binary").as("key"),
      col("envelope").cast("binary").as("value"))

  /** The consumer half: value bytes → the envelope string column the
    * app pipelines parse (SimpleStringSchema). */
  def envelopeFromKafka(df: DataFrame): DataFrame =
    df.select(col("value").cast("string").as("envelope"))
}
