package graft

import org.apache.spark.sql.functions._
import graft.streaming.StatefulStreams

/** Streaming-vs-batch agreement (SURVEY.md §7.5 risk 3): the Structured
  * Streaming rebuilds must produce the same results as their batch twins
  * when driven over the same bounded input (memory sink +
  * processAllAvailable = synchronous micro-batch execution). */
class StreamingSpec extends SparkSuite {

  private def runStream[T](df: org.apache.spark.sql.Dataset[T],
      name: String, mode: String): org.apache.spark.sql.DataFrame = {
    val sq = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    sq.processAllAvailable()
    sq.stop()
    spark.table(name)
  }

  test("windowed counts: stream == batch groupBy window") {
    val streamed = runStream(
      StatefulStreams.windowedCounts(spark, sf), "win_counts", "append")
    // batch twin via the same window() builtin
    val e = Tables(spark, sf, "events")
    val batch = e
      .withColumn("et", timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts"))))
      .groupBy(window(col("et"), "10 seconds"), col("event_type"))
      .agg(count(lit(1)).as("pv_ct"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("pv_ct"))
    // append mode only emits CLOSED windows: watermark = max(et) - 3 s,
    // so windows whose end is beyond it are (correctly) withheld
    val wm = e.agg(max(timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts")))) - expr("INTERVAL 3 SECONDS"))
      .head.getTimestamp(0)
    val closed = batch.filter(
      to_timestamp(col("edt"), "yyyy-MM-dd HH:mm:ss") <= lit(wm))
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0)
    assert(batch.exceptAll(streamed).count() <= 2) // ≤ the open tail windows
  }

  test("daily-first state: stream emits exactly the batch rn=1 user-days") {
    val streamed = runStream(
      StatefulStreams.dailyFirstStream(spark, sf), "daily_first", "append")
      .select(col("user_id"), col("cur_date"))
    val batch = Tables(spark, sf, "events").select(col("user_id"),
        graft.functions.Fns.curDate(graft.functions.Fns.nsToSec(col("ts")))
          .as("cur_date"))
      .distinct()
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("last-seen state agrees with a7 batch dedup") {
    val streamed = runStream(
      StatefulStreams.lastSeenStream(spark, sf), "last_seen", "update")
    // one micro-batch ⇒ one output row per user; final state = batch answer
    val finalRows = streamed
      .select(col("user_id"), col("last_event_id"),
        col("last_event_type"), col("last_value"))
    val batch = q("a7_dedup_last")
    assert(finalRows.exceptAll(batch).count() == 0 &&
      batch.exceptAll(finalRows).count() == 0)
  }
}
