package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.Fns

/** Batch twins of the reference's keyed-state operators (SURVEY.md §2.6).
  * Each has a streaming sibling in [[graft.streaming.StatefulStreams]]
  * built on flatMapGroupsWithState; the two are property-tested to agree.
  *
  *  - A7 stateful last-write-wins dedup by unique key
  *    (DwsTradeSkuOrderWindow.java:190-223, DwsTradeProvinceOrderWindow.java:74-99).
  *    Flink needed the emit-negation dance because upstream outer joins
  *    retract; Spark's append-only joins reduce this to row_number()=1.
  *  - A8 daily-first detection / UV (ValueState lastVisitDate + 1-day TTL,
  *    DwsTrafficVcChArIsNewPageViewWindow.java:58-106,
  *    DwsTrafficHomeDetailPageViewWindow.java:79-131).
  *  - A8 returning-visitor rule: uid seen before with a gap ≥ 8 days
  *    (DwsUserUserLoginWindow.java:103-112).
  *  - A9 new/old-visitor correction: is_new rewritten from first-seen date
  *    (DwdBaseLog.fixedNewAndOld:121-188).
  *
  * Scale notes: all four are a single shuffle on the entity key (user_id)
  * — exactly the keyBy the reference does — followed by a window function
  * or aggregation within the partition. The distinct (user, day) projection
  * runs BEFORE the window/lag work, collapsing the shuffled volume from
  * events to active-user-days (orders of magnitude at 100 TB).
  */
object StatefulTwins extends QueryModule {
  import Fns._

  /** A7: last event per user (ties broken by event_id — deterministic). */
  private def dedupLast(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("value").as("last_value"))
  }

  /** A8: daily unique users via first-event-of-day detection (the batch
    * twin of ValueState lastVisitDate; rn=1 per (user, day) marks the
    * state transition, the per-day count is the emitted UV). */
  private def dailyUv(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val day = curDate(nsToSec(col("ts")))
    val w = Window.partitionBy(col("user_id"), col("cur_date"))
      .orderBy(col("ts"), col("event_id"))
    e.select(day.as("cur_date"), col("user_id"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("cur_date")
      .agg(count(lit(1)).as("uu_ct"))
  }

  /** A8 returning-visitor rule: per day, users whose previous active day
    * is ≥ 8 days earlier (DwsUserUserLoginWindow.java:103-112). */
  private def backVisitors(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val userDays = e
      .select(col("user_id"), curDate(nsToSec(col("ts"))).as("cur_date"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("cur_date"))
    userDays
      .withColumn("prev_date", lag(col("cur_date"), 1).over(w))
      .filter(col("prev_date").isNotNull &&
        datediff(to_date(col("cur_date")), to_date(col("prev_date"))) >= 8)
      .groupBy("cur_date")
      .agg(count(lit(1)).as("back_ct"))
  }

  /** A9: is_new correction — an event is "new" iff its day equals the
    * user's first-seen day (min-date over the user partition replaces the
    * keyed firstVisitDate state). */
  private def isNewFix(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val userDays = e
      .select(col("user_id"), curDate(nsToSec(col("ts"))).as("cur_date"))
      .distinct()
    val w = Window.partitionBy(col("user_id"))
    userDays
      .withColumn("first_date", min(col("cur_date")).over(w))
      .groupBy("cur_date")
      .agg(
        sum(when(col("cur_date") === col("first_date"), 1L).otherwise(0L))
          .as("new_uv"),
        sum(when(col("cur_date") =!= col("first_date"), 1L).otherwise(0L))
          .as("old_uv"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "a7_dedup_last" -> dedupLast,
    "a8_daily_uv" -> dailyUv,
    "a8_back_visitors" -> backVisitors,
    "a9_is_new_fix" -> isNewFix)

  private val day = "strftime(ts, '%Y-%m-%d')"

  val oracles = Map(
    "a7_dedup_last" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type, "value" AS last_value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    "a8_daily_uv" ->
      s"""SELECT $day AS cur_date, count(DISTINCT user_id) AS uu_ct
         |FROM events GROUP BY 1""".stripMargin,
    "a8_back_visitors" ->
      s"""WITH user_days AS (SELECT DISTINCT user_id, $day AS cur_date FROM events),
         |lagged AS (SELECT user_id, cur_date,
         |    lag(cur_date) OVER (PARTITION BY user_id ORDER BY cur_date) AS prev_date
         |  FROM user_days)
         |SELECT cur_date, count(*) AS back_ct FROM lagged
         |WHERE prev_date IS NOT NULL
         |  AND date_diff('day', CAST(prev_date AS DATE), CAST(cur_date AS DATE)) >= 8
         |GROUP BY 1""".stripMargin,
    "a9_is_new_fix" ->
      s"""WITH user_days AS (SELECT DISTINCT user_id, $day AS cur_date FROM events),
         |flagged AS (SELECT user_id, cur_date,
         |    min(cur_date) OVER (PARTITION BY user_id) AS first_date
         |  FROM user_days)
         |SELECT cur_date,
         |       CAST(SUM(CASE WHEN cur_date = first_date THEN 1 ELSE 0 END) AS BIGINT) AS new_uv,
         |       CAST(SUM(CASE WHEN cur_date <> first_date THEN 1 ELSE 0 END) AS BIGINT) AS old_uv
         |FROM flagged GROUP BY 1""".stripMargin)
}
