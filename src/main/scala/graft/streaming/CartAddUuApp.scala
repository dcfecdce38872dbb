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
  * lastCartDate state marking each user's first add of the day
  * (processElement:84-94 collects the record just when the state day
  * changes) → 10 s tumbling windowAll count (the AggregateFunction
  * acc, :102-123) → stt/edt/cur_date finisher (:125-139).
  *
  * 'click' events play cart-adds. The batch twin states the state
  * machine as a lag() window under the (sec, event_id) total order; the
  * a19 oracle replays it end to end in SQL.
  *
  * Translation note (Flink→Spark time semantics): the reference DROPS
  * non-first events inside processElement — safe in Flink, whose
  * watermark is a control signal that advances through an operator
  * regardless of what it emits. Spark derives the downstream window's
  * watermark from the rows that actually FLOW past the watermark node,
  * so a suppressing stateful op would stall event time and leave
  * closed windows unserved (caught by StreamingSpec's round-8
  * freshness probe). The Spark-idiomatic form: the keyed state EMITS
  * every event with a uu FLAG, the watermark is taken over the full
  * flagged stream, and the first-of-day cut is a filter after it —
  * identical output, Flink-equivalent time progress.
  *
  * Scale notes: the flag stage is a keyed shuffle on user_id; the
  * global window after it aggregates the filtered one-row-per-user-day
  * stream — partial counts combine map-side, so the "windowAll
  * parallelism-1 barrier" of the reference costs one scalar merge here. */
object CartAddUuApp {
  import Fns._

  case class CartEvent(user_id: Long, sec: Long, event_id: Long)
  case class CartFlag(user_id: Long, sec: Long, event_id: Long, uu: Int)

  /** Cart-add candidates. */
  def cartAdds(events: DataFrame): Dataset[CartEvent] = {
    import events.sparkSession.implicits._
    events.filter(col("event_type") === "click")
      .select(col("user_id"), nsToSec(col("ts")).as("sec"), col("event_id"))
      .as[CartEvent]
  }

  /** lastCartDate keyed state: flag the record on a day change
    * (DwsTradeCartAddUuWindow.java:84-94); every event is emitted so
    * downstream event time keeps advancing (see the class doc). */
  private[graft] def firstOfDay(uid: Long, events: Iterator[CartEvent],
      state: GroupState[String]): Iterator[CartFlag] =
    events.toSeq.sortBy(e => (e.sec, e.event_id)).iterator.map { e =>
      val day = StreamDates.dayOf(e.sec)
      val first = !state.getOption.contains(day)
      if (first) state.update(day)
      CartFlag(e.user_id, e.sec, e.event_id, if (first) 1 else 0)
    }

  def uuStream(adds: Dataset[CartEvent]): Dataset[CartFlag] = {
    import adds.sparkSession.implicits._
    adds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(firstOfDay)
  }

  /** Batch twin: the day-change flag as a lag() window. */
  def uuBatch(adds: Dataset[CartEvent]): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    adds.toDF()
      .withColumn("day", curDate(col("sec")))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .select(col("user_id"), col("sec"), col("event_id"),
        when(col("prev_day").isNull || col("prev_day") =!= col("day"), 1)
          .otherwise(0).as("uu"))
  }

  /** 10 s global window count + finisher (cart_add_uu_ct). The uu cut
    * is folded INTO the aggregate (sum of flags) with a post-agg
    * filter dropping zero-uu windows — NOT a row filter: Catalyst
    * pushes a predicate that doesn't reference the event-time column
    * BELOW the watermark node, which would starve the watermark of the
    * unflagged rows all over again. This way every cart event advances
    * event time, and the emitted windows equal the reference's
    * windowAll over its pre-filtered stream (a window with no
    * first-of-day row emits nothing). */
  def windowCounts(uu: DataFrame): DataFrame =
    uu.withColumn("et", timestamp_seconds(col("sec")))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 seconds"))
      .agg(sum(col("uu")).as("cart_add_uu_ct"))
      .filter(col("cart_add_uu_ct") > 0)
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
