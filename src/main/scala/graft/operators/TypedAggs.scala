package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** A6: the reference's custom AggregateFunction surface
  * (DwsTradeCartAddUuWindow.java:102-139 — acc-based unique-user count;
  * TradeProvinceOrderBean.java:40-41 — exact distinct-set accumulator)
  * rebuilt as a typed `Aggregator[IN, BUF, OUT]` registered through
  * `udaf`, the Spark-native UDAF surface (SURVEY.md §2.9).
  *
  * [[DistinctCount]] unions per-partition Long sets — the literal
  * Set<String> accumulator of TradeProvinceOrderBean. It exists to prove
  * the Aggregator/merge contract (spec + oracle vs count(DISTINCT));
  * production code favors the built-in countDistinct (partial-agg +
  * codegen) — at 100 TB an exact set accumulator is only right when the
  * per-group cardinality is provably bounded, otherwise use
  * approx_count_distinct (HLL). Both are asserted against it in the spec.
  */
object TypedAggs extends QueryModule {

  /** Exact distinct-count accumulator (bounded-cardinality keys only). */
  object DistinctCount extends Aggregator[Long, Set[Long], Long] {
    def zero: Set[Long] = Set.empty
    def reduce(b: Set[Long], a: Long): Set[Long] = b + a
    def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 union b2
    def finish(b: Set[Long]): Long = b.size.toLong
    def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** a6: cart-add unique users per (day, channel) via the typed
    * accumulator — the DwsTradeCartAddUuWindow shape. */
  private def typedAggregator(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val distinctUsers = udaf(DistinctCount)
    e.select(
        graft.functions.Fns.curDate(graft.functions.Fns.nsToSec(col("ts")))
          .as("cur_date"),
        col("event_type").as("ch"), col("user_id"))
      .groupBy("cur_date", "ch")
      .agg(distinctUsers(col("user_id")).as("uu_ct"),
        count(lit(1)).as("pv_ct"))
  }

  /** a16: daily UV via the [[graft.functions.HllSketch]] HLL aggregator —
    * the unbounded-cardinality scale path A4/A6 stop short of. The oracle
    * checks the exact count AND the sketch's error-bound contract: hll_ok
    * is computed from the (deterministic, partition-order-independent)
    * estimate in Spark and stated as the constant `true` by the oracle —
    * an estimate drifting past ±5 % flips the bit and fails the hash
    * compare. The estimate itself is additionally bounded against exact
    * and approx_count_distinct in the spec. */
  private def hllUv(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val hll = udaf(graft.functions.HllSketch)
    e.select(
        graft.functions.Fns.curDate(graft.functions.Fns.nsToSec(col("ts")))
          .as("cur_date"),
        col("user_id"))
      .groupBy("cur_date")
      .agg(countDistinct(col("user_id")).as("exact_uv"),
        hll(col("user_id")).as("hll_uv"))
      .select(col("cur_date"), col("exact_uv"),
        (abs(col("hll_uv") - col("exact_uv")).cast("double") <=
          col("exact_uv") * lit(0.05)).as("hll_ok"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "a6_typed_aggregator" -> typedAggregator,
    "a16_hll_uv" -> hllUv)

  val oracles = Map(
    "a6_typed_aggregator" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS cur_date, event_type AS ch,
        |       count(DISTINCT user_id) AS uu_ct, count(*) AS pv_ct
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a16_hll_uv" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
        |       count(DISTINCT user_id) AS exact_uv,
        |       true AS hll_ok
        |FROM events GROUP BY 1""".stripMargin)
}
