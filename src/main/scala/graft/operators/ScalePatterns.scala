package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.{Fns, Oracle}

/** Skew- and shuffle-management patterns that only matter at cluster
  * scale, expressed so they stay oracle-checkable (the rewrite must be
  * semantically invisible).
  *
  *  - Salted two-phase aggregation: the events table has only 5
  *    event_type keys — at 100 TB a plain groupBy(event_type) funnels the
  *    whole table through 5 reducers. Phase 1 aggregates on
  *    (key, salt = hash(row) % N) spreading each hot key over N
  *    reducers; phase 2 merges the N partials per key. Catalyst's
  *    map-side partial aggregation already does this for algebraic aggs —
  *    the explicit salt matters for the non-algebraic ones
  *    (exact distinct sets, collect_list) where partial-agg can't help.
  *  - Two-phase exact distinct: countDistinct under salt =
  *    distinct (key, salt, user) partials → merge — the same rewrite
  *    Spark plans for count(DISTINCT) via Expand, written explicitly so
  *    the shuffle keys are visible and tunable.
  */
object ScalePatterns extends QueryModule {
  import Fns._

  private val SALT_BUCKETS = 16

  /** Salted two-phase sum/count over a 5-key (maximally skewed) space. */
  private def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val salted = e.select(col("event_type").as("ch"),
        pmod(col("event_id"), lit(SALT_BUCKETS.toLong)).as("salt"),
        col("value"), col("user_id"))
      .groupBy("ch", "salt") // phase 1: hot keys spread over 16 reducers
      .agg(count(lit(1)).as("pv_part"),
        sum(money(col("value"))).as("amt_part"))
    salted.groupBy("ch") // phase 2: 16 partials per key
      .agg(sum(col("pv_part")).as("pv_ct"),
        sum(col("amt_part")).cast("double").as("amount_sum"))
  }

  /** Salted exact-distinct: user sets per hot key without a single-reducer
    * distinct (the explicit form of Spark's Expand-based rewrite). */
  private def saltedDistinct(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val partials = e.select(col("event_type").as("ch"),
        pmod(col("user_id"), lit(SALT_BUCKETS.toLong)).as("salt"),
        col("user_id"))
      .distinct() // (ch, salt, user) — dedup spread over salt buckets
      .groupBy("ch", "salt")
      .agg(count(lit(1)).as("uv_part"))
    partials.groupBy("ch")
      .agg(sum(col("uv_part")).as("uv_ct")) // salts partition users → sum is exact
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "x1_salted_agg" -> saltedAgg,
    "x2_salted_distinct" -> saltedDistinct)

  val oracles = Map(
    "x1_salted_agg" ->
      s"""SELECT event_type AS ch, count(*) AS pv_ct,
         |       ${Oracle.moneySum("\"value\"")} AS amount_sum
         |FROM events GROUP BY 1""".stripMargin,
    "x2_salted_distinct" ->
      """SELECT event_type AS ch, count(DISTINCT user_id) AS uv_ct
        |FROM events GROUP BY 1""".stripMargin)
}
