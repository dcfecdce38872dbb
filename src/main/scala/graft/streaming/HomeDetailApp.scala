package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.functions.Fns

/** The reference's home/detail page-view DWS app composed whole
  * (DwsTrafficHomeDetailPageViewWindow.java:78-160): page stream →
  * keyed DOUBLE state (homeLastVisitDate + detailLastVisitDate,
  * :81-96) emitting per-event home/detail UV flags only when one fires
  * (:99-131) → 10 s tumbling windowAll reduce (:136-146) → stt/edt/
  * cur_date finisher (:148-158).
  *
  * 'view' events play page views; even event_ids are the 'home' page,
  * odd ones 'good_detail' (the page_id dimension of the fixture). The
  * batch twin states both state machines as one lag() window
  * partitioned by (mid, page); the a20 oracle replays it in SQL. */
object HomeDetailApp {
  import Fns._

  case class PageView(user_id: Long, page: String, sec: Long,
    event_id: Long)
  case class HomeDetailFlag(sec: Long, event_id: Long, home_uv: Int,
    detail_uv: Int)
  /** The two ValueStates of the reference as one state row. */
  case class HdState(homeDay: String, detailDay: String)

  def pageViews(events: DataFrame): Dataset[PageView] = {
    import events.sparkSession.implicits._
    events.filter(col("event_type") === "view")
      .select(col("user_id"),
        when(col("event_id") % 2 === 0, "home").otherwise("good_detail")
          .as("page"),
        nsToSec(col("ts")).as("sec"), col("event_id"))
      .as[PageView]
  }

  /** The two-state processElement: a flag fires when the page's own
    * last-visit day differs from the event day
    * (DwsTrafficHomeDetailPageViewWindow.java:99-131). The reference
    * drops unflagged rows inside processElement; here EVERY event is
    * emitted (flags 0/0 when nothing fired) because Spark derives the
    * downstream window's watermark from the rows flowing past the
    * watermark node — a suppressing stateful op would stall event time
    * and leave closed windows unserved (the round-8 freshness probe's
    * finding; Flink's watermark is a control signal and has no such
    * coupling). The flag cut happens after the watermark, in
    * [[windowSums]]. */
  private[graft] def flagGroup(mid: Long, events: Iterator[PageView],
      state: GroupState[HdState]): Iterator[HomeDetailFlag] =
    events.toSeq.sortBy(e => (e.sec, e.event_id)).iterator.map { e =>
      val day = StreamDates.dayOf(e.sec)
      val st = state.getOption.getOrElse(HdState("", ""))
      if (e.page == "home") {
        if (st.homeDay != day) {
          state.update(st.copy(homeDay = day))
          HomeDetailFlag(e.sec, e.event_id, 1, 0)
        } else HomeDetailFlag(e.sec, e.event_id, 0, 0)
      } else {
        if (st.detailDay != day) {
          state.update(st.copy(detailDay = day))
          HomeDetailFlag(e.sec, e.event_id, 0, 1)
        } else HomeDetailFlag(e.sec, e.event_id, 0, 0)
      }
    }

  def flagStream(views: Dataset[PageView]): Dataset[HomeDetailFlag] = {
    import views.sparkSession.implicits._
    views.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(flagGroup)
  }

  /** Batch twin: one lag() window per (mid, page) — the first view of
    * each (mid, page, day) carries that page's flag; other rows carry
    * zero flags (the streaming twin emits them too). */
  def flagBatch(views: Dataset[PageView]): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("page"))
      .orderBy(col("sec"), col("event_id"))
    views.toDF()
      .withColumn("day", curDate(col("sec")))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("fired",
        col("prev_day").isNull || col("prev_day") =!= col("day"))
      .select(col("sec"), col("event_id"),
        when(col("fired") && col("page") === "home", 1).otherwise(0)
          .as("home_uv"),
        when(col("fired") && col("page") =!= "home", 1).otherwise(0)
          .as("detail_uv"))
  }

  /** 10 s global window sums + finisher. The flag cut is a POST-AGG
    * filter on the summed flags, not a row filter — Catalyst would
    * push a non-event-time predicate below the watermark node and
    * starve it of the zero-flag rows (see [[flagGroup]]); summing the
    * flags lets every page view advance event time while windows with
    * no fired flag emit nothing, the reference's windowAll over its
    * pre-filtered stream. */
  def windowSums(flags: DataFrame): DataFrame =
    flags.withColumn("et", timestamp_seconds(col("sec")))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 seconds"))
      .agg(sum(col("home_uv")).as("home_uv_ct"),
        sum(col("detail_uv")).as("good_detail_uv_ct"))
      .filter(col("home_uv_ct") + col("good_detail_uv_ct") > 0)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        substring(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"),
          1, 10).as("cur_date"),
        col("home_uv_ct"), col("good_detail_uv_ct"))

  /** Batch twin of the whole app — the a20 oracle query. */
  def batch(s: SparkSession, dir: String): DataFrame =
    windowSums(flagBatch(pageViews(Tables(s, dir, "events"))))
}
