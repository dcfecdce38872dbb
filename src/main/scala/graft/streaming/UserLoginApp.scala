package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.functions.Fns

/** The reference's user-login DWS app composed whole
  * (DwsUserUserLoginWindow.java:44-159): login page stream → keyed
  * lastLoginDate state emitting per-event uu/back flags (uu = first
  * login of the day; back = returning after ≥ 8 absent days) → 10 s
  * tumbling window sums → day-partitioned store.
  *
  * The batch twin states the state machine as a lag() window (previous
  * login day per user under the (sec, event_id) total order), and the
  * a18 oracle replays flags + window sums end to end in SQL. 'view'
  * events play the login-page filter (uid present ∧ entry page). */
object UserLoginApp {
  import Fns._

  case class LoginEvent(user_id: Long, sec: Long, event_id: Long)
  case class FlaggedLogin(user_id: Long, sec: Long, event_id: Long,
    uu: Int, back: Int)

  private def dayOf(sec: Long): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    fmt.format(java.time.Instant.ofEpochSecond(sec))
  }

  /** The lastLoginDate keyed state (DwsUserUserLoginWindow.java:88-128):
    * uu on a day's first login; back when the previous login day is ≥ 8
    * days behind. State = last login day. */
  private[graft] def flagGroup(uid: Long, events: Iterator[LoginEvent],
      state: GroupState[String]): Iterator[FlaggedLogin] = {
    events.toSeq.sortBy(e => (e.sec, e.event_id)).iterator.map { e =>
      val day = dayOf(e.sec)
      val last = state.getOption
      val uu = if (!last.contains(day)) 1 else 0
      val back = last match {
        case Some(d) if d != day &&
          java.time.temporal.ChronoUnit.DAYS.between(
            java.time.LocalDate.parse(d), java.time.LocalDate.parse(day))
            >= 8 => 1
        case _ => 0
      }
      state.update(day)
      FlaggedLogin(uid, e.sec, e.event_id, uu, back)
    }
  }

  /** Login candidates: 'view' events (the uid-present entry-page
    * filter of the reference). */
  def logins(events: DataFrame): Dataset[LoginEvent] = {
    import events.sparkSession.implicits._
    events.filter(col("event_type") === "view")
      .select(col("user_id"), nsToSec(col("ts")).as("sec"), col("event_id"))
      .as[LoginEvent]
  }

  def flagStream(logins: Dataset[LoginEvent]): Dataset[FlaggedLogin] = {
    import logins.sparkSession.implicits._
    logins.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(flagGroup)
  }

  /** Batch twin of the state machine: previous login day via lag()
    * under the same (sec, event_id) total order. */
  def flagBatch(logins: Dataset[LoginEvent]): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    logins.toDF()
      .withColumn("day", curDate(col("sec")))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .select(col("user_id"), col("sec"), col("event_id"),
        when(col("prev_day").isNull || col("prev_day") =!= col("day"), 1)
          .otherwise(0).as("uu"),
        when(col("prev_day").isNotNull && col("prev_day") =!= col("day") &&
          datediff(to_date(col("day")), to_date(col("prev_day"))) >= 8, 1)
          .otherwise(0).as("back"))
  }

  /** Shared 10 s window finisher over flagged logins. */
  def windowSums(flagged: DataFrame): DataFrame =
    flagged
      .withColumn("et", timestamp_seconds(col("sec")))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 seconds"))
      .agg(sum(col("uu")).as("uu_ct"), sum(col("back")).as("back_ct"),
        count(lit(1)).as("login_ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        substring(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"),
          1, 10).as("cur_date"),
        col("uu_ct"), col("back_ct"), col("login_ct"))

  /** Batch twin of the whole app — the a18 oracle query. */
  def batch(s: SparkSession, dir: String): DataFrame =
    windowSums(flagBatch(logins(Tables(s, dir, "events"))))
}
