package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.functions.Fns

/** Shared driver-side day formatting for the keyed-state apps (the
  * DateFormatUtil.tsToDate of the reference, UTC like the session). */
private[streaming] object StreamDates {
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd").withZone(java.time.ZoneOffset.UTC)
  def dayOf(sec: Long): String =
    fmt.format(java.time.Instant.ofEpochSecond(sec))
}

/** The reference's cart-add unique-user DWS app composed whole
  * (DwsTradeCartAddUuWindow.java:55-145): cart-add stream → keyed
  * lastCartDate state emitting ONLY each user's first add of the day
  * (processElement:84-94 collects the record just when the state day
  * changes) → 10 s tumbling windowAll count (the AggregateFunction
  * acc, :102-123) → stt/edt/cur_date finisher (:125-139).
  *
  * 'click' events play cart-adds. The batch twin states the state
  * machine as a lag() window under the (sec, event_id) total order; the
  * a19 oracle replays it end to end in SQL.
  *
  * Scale notes: the flag stage is a keyed shuffle on user_id; the
  * global window after it aggregates pre-filtered (one-row-per-user-day)
  * data — partial counts combine map-side, so the "windowAll
  * parallelism-1 barrier" of the reference costs one scalar merge here. */
object CartAddUuApp {
  import Fns._

  case class CartEvent(user_id: Long, sec: Long, event_id: Long)

  /** Cart-add candidates. */
  def cartAdds(events: DataFrame): Dataset[CartEvent] = {
    import events.sparkSession.implicits._
    events.filter(col("event_type") === "click")
      .select(col("user_id"), nsToSec(col("ts")).as("sec"), col("event_id"))
      .as[CartEvent]
  }

  /** lastCartDate keyed state: emit the record only on a day change
    * (DwsTradeCartAddUuWindow.java:84-94). */
  private[graft] def firstOfDay(uid: Long, events: Iterator[CartEvent],
      state: GroupState[String]): Iterator[CartEvent] =
    events.toSeq.sortBy(e => (e.sec, e.event_id)).iterator.flatMap { e =>
      val day = StreamDates.dayOf(e.sec)
      if (!state.getOption.contains(day)) { state.update(day); Some(e) }
      else None
    }

  def uuStream(adds: Dataset[CartEvent]): Dataset[CartEvent] = {
    import adds.sparkSession.implicits._
    adds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(firstOfDay)
  }

  /** Batch twin: the day-change emission as a lag() window. */
  def uuBatch(adds: Dataset[CartEvent]): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    adds.toDF()
      .withColumn("day", curDate(col("sec")))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .filter(col("prev_day").isNull || col("prev_day") =!= col("day"))
      .select(col("user_id"), col("sec"), col("event_id"))
  }

  /** 10 s global window count + finisher (cart_add_uu_ct). */
  def windowCounts(uu: DataFrame): DataFrame =
    uu.withColumn("et", timestamp_seconds(col("sec")))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 seconds"))
      .agg(count(lit(1)).as("cart_add_uu_ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        substring(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"),
          1, 10).as("cur_date"),
        col("cart_add_uu_ct"))

  /** Batch twin of the whole app — the a19 oracle query. */
  def batch(s: SparkSession, dir: String): DataFrame =
    windowCounts(uuBatch(cartAdds(Tables(s, dir, "events"))))
}
