package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** The reference's flagship DWS application, rebuilt whole:
  * DwsTrafficSourceKeywordPageViewWindow (kafka topic_log → filter search
  * pages → ik_analyze UDTF → LATERAL explode → TUMBLE 10 s → count per
  * (window, keyword) → Doris sink; DwsTrafficSourceKeywordPageViewWindow
  * .java:30-84).
  *
  * Spark form: file stream → filter → [[graft.plans.TokenizeGenerator]]
  * (the genuine UDTF surface) → watermarked 10 s window → count →
  * day-partitioned parquet sink. The batch twin runs the identical
  * transform chain under spark.read — the two are reconciled in
  * KeywordAppSpec.
  */
object KeywordApp {
  import Fns._

  /** Search phrase per qualifying event — deterministic stand-in for the
    * page.item search keyword (events carry no text; the phrase derives
    * from props.k, mod-cycled over a small vocabulary). */
  private def withPhrase(df: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    df.filter(col("event_type") === "view") // page = search analog
      .withColumn("fullword",
        concat(lit("spark "),
          element_at(array(lit("query"), lit("join"), lit("window"),
            lit("stream"), lit("table")), (pmod(k, lit(5L)) + 1).cast("int")),
          lit(" "),
          element_at(array(lit("fast"), lit("slow")),
            (pmod(k, lit(2L)) + 1).cast("int"))))
  }

  /** Shared transform chain: phrase → UDTF tokens → 10 s window count. */
  def transform(s: SparkSession, events: DataFrame): DataFrame = {
    val phrased = withPhrase(events)
      .withColumn("et", timestamp_seconds(nsToSec(col("ts"))))
    phrased
      .select(col("et"),
        graft.plans.TokenizeGenerator.tokens(s, col("fullword")).as("keyword"))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 seconds"), col("keyword"))
      .agg(count(lit(1)).as("keyword_count"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        substring(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"), 1, 10)
          .as("cur_date"),
        col("keyword"), col("keyword_count"))
  }

  /** Streaming app: source → transform → day-partitioned parquet sink. */
  def run(s: SparkSession, dir: String, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    transform(s, StatefulStreams.eventStream(s, dir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .partitionBy("cur_date")
      .format("parquet").option("path", outDir)
      .start()

  /** Batch twin over the same parquet (for reconciliation and serving). */
  def batch(s: SparkSession, dir: String): DataFrame =
    transform(s, graft.Tables(s, dir, "events"))
}
