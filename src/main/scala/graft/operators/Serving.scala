package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.{Fns, Oracle}

/** ADS/serving-layer queries (SURVEY.md §2.6 A10, §3.3): the publisher's
  * three Doris SQL endpoints — /gmv, /province, /ch top-N — re-expressed
  * over the warehouse tables with day-partition-pruning-shaped filters
  * (`partition parYYYYMMDD` ≈ a cur_date predicate that Catalyst prunes
  * when the DWS output is partitionBy("cur_date")).
  *
  *  - TradeStatsMapper.java:16-17 (sum(order_amount) for one day)
  *  - TradeStatsMapper.java:20-22 (group by province_name)
  *  - TrafficStatsMapper.java:16-18 (order by uv_ct desc limit N)
  */
object Serving extends QueryModule {
  import Fns._

  /** A10a: GMV per day over a pruned date range (the `partition par#{date}`
    * clause becomes a pushed-down predicate on the partition column). */
  private def gmvByDay(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    o.select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"),
        col("o_totalprice"))
      .filter(col("cur_date") >= "1997-01-01" && col("cur_date") <= "1997-12-31")
      .groupBy("cur_date")
      .agg(moneySum(col("o_totalprice")).as("gmv"),
        count(lit(1)).as("order_ct"))
  }

  /** A10b: order amount by province (nation plays province). */
  private def amountByProvince(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("province_name"))
      .agg(moneySum(col("o_totalprice")).as("order_amount"),
        countDistinct(col("o_orderkey")).as("order_ct"))
  }

  /** A10c: top-10 channels by UV, deterministic tie-break. */
  private def topChannels(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    e.groupBy(col("event_type").as("ch"))
      .agg(countDistinct(col("user_id")).as("uv_ct"),
        count(lit(1)).as("pv_ct"))
      .orderBy(col("uv_ct").desc, col("ch"))
      .limit(10)
  }

  /** Beyond-reference (SURVEY §2.6 notes grouping sets absent): ROLLUP
    * over the region→nation hierarchy — subtotal rows (NULL-filled) per
    * level, one pass. */
  private def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(moneySum(col("o_totalprice")).as("order_amount"),
        count(lit(1)).as("order_ct"))
  }

  /** Beyond-reference: pivot — per-day event counts spread to one column
    * per channel (explicit value list keeps the schema static). */
  private def pivotChannels(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    e.select(curDate(nsToSec(col("ts"))).as("cur_date"), col("event_type"))
      .groupBy("cur_date")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  /** Beyond-reference: CUBE — all 2^2 grouping sets over
    * (month, priority) in one pass (rollup covers the hierarchy case;
    * cube covers independent dimensions). */
  private def cubeRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    o.select(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        col("o_orderpriority"), col("o_totalprice"))
      .cube(col("order_month"), col("o_orderpriority"))
      .agg(moneySum(col("o_totalprice")).as("order_amount"),
        count(lit(1)).as("order_ct"))
  }

  /** Beyond-reference (SURVEY §2.6: set operations absent): INTERSECT /
    * EXCEPT over yearly customer cohorts — retention and churn sets in
    * one pass each. Both compile to aggregate/join plans (no dedicated
    * set operator at runtime), so they scale like any keyed join. */
  private def cohortSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val y95 = o.filter(expr("year(o_orderdate) = 1995")).select(col("o_custkey"))
    val y96 = o.filter(expr("year(o_orderdate) = 1996")).select(col("o_custkey"))
    val retained = y95.intersect(y96).select(lit("retained").as("cohort"),
      col("o_custkey"))
    val churned = y95.except(y96).select(lit("churned").as("cohort"),
      col("o_custkey"))
    retained.unionByName(churned)
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("cust_ct"), min(col("o_custkey")).as("min_cust"),
        max(col("o_custkey")).as("max_cust"))
  }

  /** Beyond-reference (SURVEY §2.6: "no ranking window functions in the
    * reference"): the full ranking-window surface in one pass over a
    * single shuffle — rank, dense_rank, ntile, lag, percent_rank. Total
    * order (price desc, key) keeps every function deterministic. */
  private def rankSuite(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
  }

  /** Dyadic EWMA weights 2^-i, i = 0..7, as exact DECIMAL(9,7) literals
    * (every value is a finite binary fraction with ≤ 7 decimal places,
    * so the weighted sums are exact in BOTH engines — no libm pow, no
    * float accumulation). */
  private val ewmaWeights: Seq[String] =
    Seq("1", "0.5", "0.25", "0.125", "0.0625", "0.03125", "0.015625",
      "0.0078125").map(x => s"CAST($x AS DECIMAL(9,7))")

  /** a25 (beyond-reference): EWMA-smoothed daily revenue per priority —
    * the serving layer's trend line over the a10 daily GMV. A true
    * recursive EWMA is not declarative; the standard bounded form is a
    * weighted moving window: ewma_t = Σ_{i=0..7} 2^-i·x_{t-i} / Σ 2^-i
    * over the 8 most recent days present (missing leading days shrink
    * the denominator — no warm-up bias). Weights are dyadic and the
    * daily amounts DECIMAL, so numerator and denominator are exact in
    * any engine and any partitioning; only the final division is
    * double. One (priority)-keyed window sort after one groupBy — the
    * same shuffle the daily rollup already pays. */
  private def ewmaRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"))
      .agg(sum(money(col("o_totalprice")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("amt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("priority")).orderBy(col("cur_date"))
    val lags = ewmaWeights.indices.map(i =>
      if (i == 0) col("amt") else lag(col("amt"), i).over(w))
    val zero = expr("CAST(0 AS DECIMAL(18,2))")
    val num = lags.zip(ewmaWeights).map { case (l, wt) =>
      coalesce(l, zero) * expr(wt) }.reduce(_ + _)
    val den = lags.zip(ewmaWeights).map { case (l, wt) =>
      when(l.isNotNull, expr(wt)).otherwise(expr("CAST(0 AS DECIMAL(9,7))"))
    }.reduce(_ + _)
    daily.select(col("priority"), col("cur_date"),
      col("amt").cast(org.apache.spark.sql.types.DoubleType)
        .as("day_amount"),
      round(num.cast(org.apache.spark.sql.types.DoubleType) /
        den.cast(org.apache.spark.sql.types.DoubleType), 6).as("ewma"))
  }

  /** a30 (beyond-reference): z-score anomaly flags on daily revenue —
    * the metric-monitoring alarm a warehouse serving layer feeds ops
    * dashboards from: each day scored against its own trailing 28-day
    * window (ROWS 27 PRECEDING, so day one is its own baseline and the
    * score warms up with history — no lookahead leakage). The window
    * sum and sum-of-squares stay exact DECIMAL (amt² of DECIMAL(18,2)
    * is exact at scale 4; 28 terms never approach the 38-digit cap),
    * so mean/variance start from bit-identical numerators in any
    * engine at any partitioning; the double math that follows
    * (mean = s/n, var = s2/n − mean², z = (x − mean)/√var) is a fixed
    * IEEE op order both engines replay. One global date-ordered window
    * over an already-day-grouped series — the sort input is one row
    * per day, bounded by the calendar, not the data. */
  private def revenueAnomaly(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    zscoreAnomalyFor(Tables(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"))
      .agg(sum(money(col("o_totalprice"))).cast(DecimalType(18, 2))
        .as("amt")))
  }

  /** The a30 core over an ARBITRARY daily series (cur_date,
    * amt DECIMAL(18,2)) — exposed through
    * [[graft.api.Graft.zscoreAnomalies]]. */
  private[graft] def zscoreAnomalyFor(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cur_date")).rowsBetween(-27, 0)
    // The ROWS frame needs exactly one row per date: an arbitrary API
    // frame may carry duplicate cur_date rows (multi-group series),
    // which would make the "28-day" window a nondeterministic 28-ROW
    // window. Collapse defensively — exact DECIMAL sum, a no-op on the
    // already-daily series the demo query passes.
    val uniq = daily.groupBy(col("cur_date"))
      .agg(sum(col("amt")).cast(DecimalType(18, 2)).as("amt"))
    val scored = uniq
      .withColumn("amt2", (col("amt") * col("amt")).cast(DecimalType(38, 4)))
      .withColumn("n28", count(lit(1)).over(w))
      .withColumn("s28", sum(col("amt")).over(w).cast(DecimalType(28, 2)))
      .withColumn("s228", sum(col("amt2")).over(w).cast(DecimalType(38, 4)))
      // DECIMAL → DOUBLE via a STRING: at sf0.1 s228's unscaled value
      // exceeds 2^53 and the two engines' direct decimal→double
      // conversions round differently in the last ulp (which variance
      // cancellation then amplifies past round(,6)); both Java's
      // parseDouble and C's strtod are correctly rounded, so the
      // string route lands on the identical double on both sides
      .withColumn("mean28",
        col("s28").cast(StringType).cast(DoubleType) /
          col("n28").cast(DoubleType))
      .withColumn("var28",
        col("s228").cast(StringType).cast(DoubleType) /
          col("n28").cast(DoubleType) -
          col("mean28") * col("mean28"))
      .withColumn("std28", sqrt(greatest(col("var28"), lit(0.0))))
      .withColumn("z",
        when(col("std28") > 0.0,
          round((col("amt").cast(DoubleType) - col("mean28")) /
            col("std28"), 6)).otherwise(lit(0.0)))
    scored.select(col("cur_date"),
      col("amt").cast(DoubleType).as("day_amount"),
      col("n28"), round(col("mean28"), 6).as("mean28"),
      round(col("std28"), 6).as("std28"), col("z"),
      (abs(col("z")) > lit(2.0)).as("anomaly"))
  }

  /** a31 (beyond-reference): calendar-spine gap filling with
    * last-observation-carried-forward — the serving-layer shape every
    * dashboard needs (a day with no orders must RENDER as a zero/flat
    * point, not silently vanish from the series). The spine is the
    * global [min, max] order-date range (one calendar for every
    * series), crossed with the priority dim — spine × 5 rows, bounded
    * by the calendar, never by the data — left-joined to the daily
    * DECIMAL rollup; LOCF is one `last(ignoreNulls)` running window
    * per series (the same (priority)-keyed sort a25 already pays).
    * Exactness: amounts stay DECIMAL until the final double rendering,
    * and LOCF copies values (no arithmetic), so both engines render
    * bit-identical series. At 100 TB the spine is still just
    * days × groups — metadata-sized — and the one shuffle is the
    * group-keyed window sort over one row per (group, day). */
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    gapFillFor(Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("g"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(money(col("o_totalprice"))).cast(DecimalType(18, 2))
        .as("amt")))
      .withColumnRenamed("g", "priority")
  }

  /** The a31 core over an ARBITRARY daily series (g group key, d DATE,
    * amt DECIMAL) — exposed through [[graft.api.Graft.gapFillLocf]].
    * The spine is the global [min(d), max(d)] calendar crossed with the
    * distinct groups, so every series renders every day. */
  private[graft] def gapFillFor(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val spine = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val groups = daily.select(col("g")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    spine.crossJoin(broadcast(groups))
      .join(daily, Seq("g", "d"), "left")
      .withColumn("locf", last(col("amt"), ignoreNulls = true).over(w))
      .select(col("g"),
        date_format(col("d"), "yyyy-MM-dd").as("cur_date"),
        col("amt").isNotNull.as("observed"),
        coalesce(col("amt"), lit(0)).cast(DoubleType).as("day_amount"),
        coalesce(col("locf"), lit(0)).cast(DoubleType).as("locf_amount"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "a31_gap_fill" -> gapFill,
    "a30_revenue_anomaly" -> revenueAnomaly,
    "a25_ewma_revenue" -> ewmaRevenue,
    "a15_rank_suite" -> rankSuite,
    "a14_cohort_setops" -> cohortSetOps,
    "a13_cube_revenue" -> cubeRevenue,
    "a10_gmv_by_day" -> gmvByDay,
    "a10_amount_by_province" -> amountByProvince,
    "a10_top_channels" -> topChannels,
    "a11_rollup_revenue" -> rollupRevenue,
    "a12_pivot_channels" -> pivotChannels)

  private def ewmaOracle: String = {
    val lagDefs = (1 to 7)
      .map(i => s"lag(amt, $i) OVER w AS l$i").mkString(",\n        |       ")
    val num = ("amt * " + ewmaWeights.head) +: (1 to 7).map(i =>
      s"coalesce(l$i, CAST(0 AS DECIMAL(18,2))) * ${ewmaWeights(i)}")
    val den = ewmaWeights.head +: (1 to 7).map(i =>
      s"CASE WHEN l$i IS NOT NULL THEN ${ewmaWeights(i)} " +
        s"ELSE CAST(0 AS DECIMAL(9,7)) END")
    s"""WITH daily AS (
       |  SELECT o_orderpriority AS priority,
       |         strftime(o_orderdate, '%Y-%m-%d') AS cur_date,
       |         CAST(sum(${Oracle.money("o_totalprice")})
       |              AS DECIMAL(18,2)) AS amt
       |  FROM orders GROUP BY 1, 2),
       |l AS (
       |  SELECT priority, cur_date, amt,
       |       $lagDefs
       |  FROM daily
       |  WINDOW w AS (PARTITION BY priority ORDER BY cur_date))
       |SELECT priority, cur_date, CAST(amt AS DOUBLE) AS day_amount,
       |       round(CAST(${num.mkString("\n         + ")} AS DOUBLE)
       |             / CAST(${den.mkString("\n         + ")} AS DOUBLE),
       |             6) AS ewma
       |FROM l""".stripMargin
  }

  val oracles = Map(
    "a31_gap_fill" ->
      s"""WITH b AS (
         |  SELECT CAST(min(o_orderdate) AS DATE) AS lo,
         |         CAST(max(o_orderdate) AS DATE) AS hi
         |  FROM orders),
         |sp AS (
         |  SELECT CAST(unnest(generate_series(lo, hi,
         |           INTERVAL '1' DAY)) AS DATE) AS d
         |  FROM b),
         |pr AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
         |daily AS (
         |  SELECT o_orderpriority AS priority,
         |         CAST(o_orderdate AS DATE) AS d,
         |         CAST(sum(${Oracle.money("o_totalprice")})
         |              AS DECIMAL(18,2)) AS amt
         |  FROM orders GROUP BY 1, 2),
         |f AS (
         |  SELECT pr.priority, sp.d, daily.amt
         |  FROM sp CROSS JOIN pr
         |  LEFT JOIN daily ON daily.priority = pr.priority
         |                 AND daily.d = sp.d)
         |SELECT priority, strftime(d, '%Y-%m-%d') AS cur_date,
         |       amt IS NOT NULL AS observed,
         |       CAST(coalesce(amt, 0) AS DOUBLE) AS day_amount,
         |       CAST(coalesce(last_value(amt IGNORE NULLS) OVER
         |         (PARTITION BY priority ORDER BY d
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
         |         AS DOUBLE) AS locf_amount
         |FROM f""".stripMargin,
    "a30_revenue_anomaly" ->
      s"""WITH daily AS (
         |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS cur_date,
         |         CAST(sum(${Oracle.money("o_totalprice")})
         |              AS DECIMAL(18,2)) AS amt
         |  FROM orders GROUP BY 1),
         |d2 AS (SELECT *,
         |         -- widen ONE operand past 18 digits: DuckDB multiplies
         |         -- DECIMAL(18)×DECIMAL(18) in the int64 lane and
         |         -- overflows on sf0.1 daily sums; ≥19 promotes to the
         |         -- int128 lane and stays exact (Spark's BigDecimal
         |         -- multiply never had the cliff)
         |         CAST(CAST(amt AS DECIMAL(19,2)) * amt
         |              AS DECIMAL(38,4)) AS amt2
         |       FROM daily),
         |win AS (
         |  SELECT cur_date, amt,
         |         count(*) OVER w AS n28,
         |         CAST(sum(amt) OVER w AS DECIMAL(28,2)) AS s28,
         |         CAST(sum(amt2) OVER w AS DECIMAL(38,4)) AS s228
         |  FROM d2
         |  WINDOW w AS (ORDER BY cur_date
         |               ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)),
         |sc AS (
         |  SELECT cur_date, amt, n28,
         |         -- decimal → double through VARCHAR (both engines'
         |         -- string parses are correctly rounded; the direct
         |         -- conversion of a >2^53-unscaled DECIMAL is not)
         |         CAST(CAST(s28 AS VARCHAR) AS DOUBLE)
         |           / CAST(n28 AS DOUBLE) AS mean28,
         |         sqrt(greatest(
         |           CAST(CAST(s228 AS VARCHAR) AS DOUBLE)
         |             / CAST(n28 AS DOUBLE)
         |             - (CAST(CAST(s28 AS VARCHAR) AS DOUBLE)
         |                / CAST(n28 AS DOUBLE))
         |               * (CAST(CAST(s28 AS VARCHAR) AS DOUBLE)
         |                  / CAST(n28 AS DOUBLE)),
         |           CAST(0 AS DOUBLE))) AS std28
         |  FROM win),
         |z AS (
         |  SELECT cur_date, amt, n28, mean28, std28,
         |         CASE WHEN std28 > 0 THEN
         |           round((CAST(amt AS DOUBLE) - mean28) / std28, 6)
         |         ELSE CAST(0 AS DOUBLE) END AS z
         |  FROM sc)
         |SELECT cur_date, CAST(amt AS DOUBLE) AS day_amount, n28,
         |       round(mean28, 6) AS mean28, round(std28, 6) AS std28,
         |       z, abs(z) > 2 AS anomaly
         |FROM z""".stripMargin,
    "a25_ewma_revenue" -> ewmaOracle,
    "a15_rank_suite" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       rank() OVER w AS rk,
        |       dense_rank() OVER w AS drk,
        |       ntile(4) OVER w AS quartile,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       percent_rank() OVER w AS pct_rank
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "a14_cohort_setops" ->
      """WITH y95 AS (SELECT o_custkey FROM orders
        |             WHERE year(o_orderdate) = 1995),
        |     y96 AS (SELECT o_custkey FROM orders
        |             WHERE year(o_orderdate) = 1996),
        |     u AS (
        |  SELECT 'retained' AS cohort, o_custkey
        |  FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
        |  UNION ALL
        |  SELECT 'churned' AS cohort, o_custkey
        |  FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96))
        |SELECT cohort, count(*) AS cust_ct, min(o_custkey) AS min_cust,
        |       max(o_custkey) AS max_cust
        |FROM u GROUP BY 1""".stripMargin,
    "a13_cube_revenue" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
         |       o_orderpriority,
         |       ${Oracle.moneySum("o_totalprice")} AS order_amount,
         |       count(*) AS order_ct
         |FROM orders
         |GROUP BY CUBE (order_month, o_orderpriority)""".stripMargin,
    "a10_gmv_by_day" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m-%d') AS cur_date,
         |       ${Oracle.moneySum("o_totalprice")} AS gmv,
         |       count(*) AS order_ct
         |FROM orders
         |WHERE strftime(o_orderdate, '%Y-%m-%d') >= '1997-01-01'
         |  AND strftime(o_orderdate, '%Y-%m-%d') <= '1997-12-31'
         |GROUP BY 1""".stripMargin,
    "a10_amount_by_province" ->
      s"""SELECT n_name AS province_name,
         |       ${Oracle.moneySum("o_totalprice")} AS order_amount,
         |       count(DISTINCT o_orderkey) AS order_ct
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1""".stripMargin,
    "a10_top_channels" ->
      """SELECT event_type AS ch, count(DISTINCT user_id) AS uv_ct,
        |       count(*) AS pv_ct
        |FROM events GROUP BY 1
        |ORDER BY uv_ct DESC, ch LIMIT 10""".stripMargin,
    "a11_rollup_revenue" ->
      s"""SELECT r_name, n_name,
         |       ${Oracle.moneySum("o_totalprice")} AS order_amount,
         |       count(*) AS order_ct
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "a12_pivot_channels" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
        |       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
        |       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin)
}
