package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.functions.Fns

/** The reference's 4-dimension traffic DWS app composed whole
  * (DwsTrafficVcChArIsNewPageViewWindow.java:55-180): page stream →
  * keyed lastVisitDate state emitting per-event uv/sv/pv/dur measures
  * (:58-106) → 10 s tumbling window keyed by (vc, ch, ar, is_new)
  * (:144-157 reduce) → stt/edt/cur_date finisher (:159-171).
  *
  * Fixture mapping over events: every event is a page view; vc =
  * 'v'+(user_id%3), ch = event_type, ar = user_id%5; the session-entry
  * flag (last_page_id == null, :93-96) is event_id%5==0; dur = value
  * summed through DECIMAL(18,2). uv fires on the user's first view of
  * the day (state day change); is_new is whether the user's FIRST-EVER
  * day equals the event day — the A9-corrected common.is_new the app
  * consumes. The batch twin states both as window functions under the
  * (sec, event_id) total order; the a21 oracle replays them in SQL.
  *
  * Scale notes: one keyed shuffle for the state stage, one for the
  * (window × 4-dim) aggregation — same two-exchange shape as the
  * reference's keyBy+window; decimal sums keep the aggregation
  * order-independent across 1000 executors. */
object TrafficPageViewApp {
  import Fns._

  case class PageView(user_id: Long, ch: String, sec: Long, event_id: Long,
    dur: Double, sv: Int)
  case class PvMeasure(user_id: Long, ch: String, sec: Long, event_id: Long,
    dur: Double, sv: Int, uv: Int, is_new: Int)
  /** lastVisitDate + the first-ever day (the is_new backing state). */
  case class TpvState(lastDay: String, firstDay: String)

  def pageViews(events: DataFrame): Dataset[PageView] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_type").as("ch"),
      nsToSec(col("ts")).as("sec"), col("event_id"),
      col("value").as("dur"),
      when(col("event_id") % 5 === 0, 1).otherwise(0).as("sv"))
      .as[PageView]
  }

  /** The keyed state machine: uv on a day change; is_new while the
    * event day equals the first day this key was ever seen. */
  private[graft] def measureGroup(mid: Long, events: Iterator[PageView],
      state: GroupState[TpvState]): Iterator[PvMeasure] =
    events.toSeq.sortBy(e => (e.sec, e.event_id)).iterator.map { e =>
      val day = StreamDates.dayOf(e.sec)
      val st = state.getOption match {
        case None => TpvState("", day)
        case Some(s0) => s0
      }
      val uv = if (st.lastDay != day) 1 else 0
      state.update(TpvState(day, st.firstDay))
      PvMeasure(e.user_id, e.ch, e.sec, e.event_id, e.dur, e.sv, uv,
        if (st.firstDay == day) 1 else 0)
    }

  def measureStream(views: Dataset[PageView]): Dataset[PvMeasure] = {
    import views.sparkSession.implicits._
    views.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(measureGroup)
  }

  /** Batch twin: uv via lag(day), is_new via first_value(day), both
    * under the (sec, event_id) total order per user. */
  def measureBatch(views: Dataset[PageView]): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    views.toDF()
      .withColumn("day", curDate(col("sec")))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("first_day", first(col("day")).over(w))
      .select(col("user_id"), col("ch"), col("sec"), col("event_id"),
        col("dur"), col("sv"),
        when(col("prev_day").isNull || col("prev_day") =!= col("day"), 1)
          .otherwise(0).as("uv"),
        when(col("first_day") === col("day"), 1).otherwise(0).as("is_new"))
  }

  /** 10 s window keyed by the four dimensions, A2-style finisher. */
  def windowSums(measures: DataFrame): DataFrame =
    measures
      .withColumn("vc", concat(lit("v"), pmod(col("user_id"), lit(3))))
      .withColumn("ar", pmod(col("user_id"), lit(5)).cast("string"))
      .withColumn("et", timestamp_seconds(col("sec")))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 seconds"),
        col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(sum(col("uv")).as("uv_ct"), sum(col("sv")).as("sv_ct"),
        count(lit(1)).as("pv_ct"),
        moneySum(col("dur")).as("dur_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        substring(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"),
          1, 10).as("cur_date"),
        col("vc"), col("ch"), col("ar"), col("is_new"),
        col("uv_ct"), col("sv_ct"), col("pv_ct"), col("dur_sum"))

  /** Batch twin of the whole app — the a21 oracle query. */
  def batch(s: SparkSession, dir: String): DataFrame =
    windowSums(measureBatch(pageViews(Tables(s, dir, "events"))))
}
