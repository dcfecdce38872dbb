package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.{QueryModule, Tables}
import graft.functions.{Fns, Oracle}

/** Join operators (SURVEY.md §2.5), rebuilt as declarative Spark joins so
  * Catalyst picks broadcast-hash vs shuffled strategies and AQE re-plans
  * at runtime.
  *
  *  - J1 stream-stream inner equi-join → plain equi-join
  *    (DwdTradeOrderDetail.java:84-108)
  *  - J2 left-outer join; Spark emits null-extended rows once, no Flink
  *    retraction stream (DwdTradeOrderDetail.java:105-108)
  *  - J3 interval join, event-time range [-30 min, +5 s]
  *    (DwdTradeOrderPaySucDetail.java:74-100)
  *  - J4/J5 lookup + async dim enrichment chain → broadcast stream-static
  *    joins (DwdInteractionCommentInfo.java:42-52,
  *    DwsTradeSkuOrderWindow.java:480-619, DimAsyncFunction.java:25-92 —
  *    the whole Redis/HBase async cascade collapses into
  *    BroadcastHashJoinExec)
  *  - J6 broadcast-config routing join (DimApp.connect:283-298,
  *    TableProcessFunction.java:47-72)
  *  - semi/anti probes (the J6 probe is left-semi + payload)
  *
  * Scale notes: only provably bounded dims (region 5, nation 25, the
  * derived config table) are broadcast unconditionally. supplier/part/
  * customer grow with the fact tables, so they go through the optimizer's
  * threshold + AQE instead of a hard-coded hint — at 100 TB those become
  * shuffled hash joins co-partitioned on the join key, which is the right
  * plan. The interval join keys on user_id first (equi-prefix), so the
  * range predicate only scans within a user's hash bucket, never a cross
  * product.
  */
object Joins extends QueryModule {
  import Fns._

  /** J1: fact-fact inner equi-join + aggregation (order "wide table"). */
  private def orderWide(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("order_ct"),
        count(lit(1)).as("line_ct"))
  }

  /** J2: left-outer with genuinely unmatched rows (orders with no returned
    * lines get null-extended once — no retraction to undo downstream). */
  private def orderReturnsLeft(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val returns = Tables(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(moneySum(col("l_extendedprice")).as("ret_amount"))
    o.join(returns, o("o_orderkey") === returns("l_orderkey"), "left_outer")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("l_orderkey").isNotNull, 1L).otherwise(0L)).as("matched_ct"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("unmatched_ct"),
        sum(money(coalesce(col("ret_amount"), lit(0)))).cast("double")
          .as("ret_amount_sum"))
  }

  /** J3: interval join — click within [purchase - 30 min, purchase + 5 s]
    * for the same user. Timestamps compared at microsecond resolution
    * (nsToUs) — the semantics DuckDB/most engines give; equi-key user_id
    * bounds the state exactly like the reference's watermark+range bound.
    */
  private def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), nsToUs(col("ts")).as("p_us"),
        col("event_id").as("p_id"), nsToSec(col("ts")).as("p_sec"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), nsToUs(col("ts")).as("c_us"))
    p.join(c, p("user_id") === c("c_user") &&
        c("c_us") >= p("p_us") - lit(1800L * 1000000L) &&
        c("c_us") <= p("p_us") + lit(5L * 1000000L))
      .groupBy(curDate(col("p_sec")).as("cur_date"))
      .agg(count(lit(1)).as("pair_ct"),
           countDistinct(col("p_id")).as("purchase_ct"))
  }

  /** J4: dimension lookup join (part plays base_dic; broadcast under the
    * optimizer threshold — FOR SYSTEM_TIME AS OF proctime ≈ re-read the
    * static side each micro-batch). */
  private def partDim(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(moneySum(col("l_extendedprice")).as("revenue"),
           sum(money(col("l_quantity"))).cast("double").as("qty"))
  }

  /** J5: the 6-step dim enrichment chain (sku→spu→tm→c3→c2→c1 analog):
    * lineitem → part + supplier → nation → region, one broadcast hash
    * join per bounded dim — replacing DimAsyncFunction's Redis/HBase
    * cascade with zero external state. */
  private def dimChain(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
    val su = Tables(s, dir, "supplier")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), col("p_type"))
      .agg(moneySum(col("l_extendedprice")).as("revenue"),
           count(lit(1)).as("line_ct"))
  }

  /** J6: broadcast-config routing — records probe a config table by key;
    * unmatched records are dropped (inner/semi semantics). The config here
    * is itself derived data (table_process rows ≈ distinct event types
    * minus 'error', routed to a dwd_* sink). */
  private def configRoute(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val config = e.select(col("event_type")).distinct()
      .filter(col("event_type") =!= "error")
      .withColumn("sink_table", concat(lit("dwd_"), col("event_type")))
    e.join(broadcast(config), Seq("event_type"))
      .groupBy(col("sink_table"))
      .agg(count(lit(1)).as("routed_ct"),
           countDistinct(col("user_id")).as("user_ct"))
  }

  /** Left-anti: customers that never ordered. */
  private def custNoOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cust_ct"))
  }

  /** Left-semi: parts that were actually sold. */
  private def partsSold(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part")
    val li = Tables(s, dir, "lineitem")
    p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("part_ct"))
  }

  /** J9 (beyond-reference; the range join Spark has no native operator
    * for): match every lineitem price to each OVERLAPPING price band of
    * a band dimension. The naive plan is a theta-join — Catalyst can
    * only produce BroadcastNestedLoopJoin (O(n·m) comparisons, and a
    * full cartesian when neither side broadcasts). The scale path
    * decomposes the range predicate into an integer-bucket EQUI-join:
    * each band is exploded to the W-wide buckets it overlaps (a few
    * rows per band, bounded by span/W), each fact row computes its one
    * bucket map-side, the join shuffles on the bucket key like any
    * hash join, and the exact range predicate re-filters inside the
    * matched bucket. A row's single bucket meets each band at most
    * once, so no dedup pass is needed. This is the standard
    * interval/range-join recipe on hash-partitioned engines (bucketed
    * band join — same family as the d2 LSH and m3 frame-hash blocking
    * joins). */
  private val bandW = 4500L
  private val bandSpan = 7000L
  private def rangeBucketJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 20)
      .select(col("id").as("band_id"), (col("id") * bandW).as("lo"),
        (col("id") * bandW + bandSpan).as("hi"))
      .select(col("band_id"), col("lo"), col("hi"),
        explode(sequence(expr(s"lo div $bandW"), expr(s"(hi - 1) div $bandW")))
          .as("bucket"))
    val li = Tables(s, dir, "lineitem")
      .select(col("l_extendedprice").as("price"))
      .withColumn("bucket", expr(s"CAST(floor(price / $bandW) AS BIGINT)"))
    li.join(bands, Seq("bucket"))
      .filter(col("price") >= col("lo") && col("price") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("row_ct"), Fns.moneySum(col("price")).as("price_sum"))
  }

  /** j12 (beyond-reference): referential-integrity audit — the DQ
    * check every warehouse load gates on: for each foreign-key edge of
    * the star schema (lineitem→orders, orders→customer,
    * customer→nation), the child row count, matched count, and orphan
    * count, each from ONE left join (null-extended parent = orphan).
    * Small parents broadcast; the lineitem→orders edge is the same
    * l_orderkey shuffle j1 pays. The audit row is what a pipeline
    * asserts on before publishing (orphans > 0 → quarantine); j7's
    * anti join is the companion that EXTRACTS the orphan rows. */
  /** One FK-edge audit over arbitrary frames — the j12 core, exposed
    * through [[graft.api.Graft.refIntegrityAudit]]. */
  private[graft] def refIntegrityFor(name: String, child: DataFrame,
      childKey: String, parent: DataFrame, parentKey: String): DataFrame = {
    // alias both sides to fixed names: the ordinary FK case names the
    // key identically on both sides, which would make the unqualified
    // join/aggregate references ambiguous
    // conventional RI semantics: a NULL child key is vacuously valid
    // (SQL FK constraints skip NULLs), so it is counted apart rather
    // than as an orphan — an audit that flagged clean nullable-FK
    // tables would train users to ignore it
    child.select(col(childKey).as("graft_ck")).join(
        parent.select(col(parentKey).as("graft_pk")).distinct(),
        col("graft_ck") === col("graft_pk"), "left_outer")
      .agg(count(lit(1)).as("child_ct"),
        sum(when(col("graft_pk").isNotNull, 1L).otherwise(0L))
          .as("matched_ct"),
        sum(when(col("graft_ck").isNotNull && col("graft_pk").isNull, 1L)
          .otherwise(0L)).as("orphan_ct"),
        sum(when(col("graft_ck").isNull, 1L).otherwise(0L))
          .as("null_key_ct"))
      .select(lit(name).as("fk_edge"), col("child_ct"),
        col("matched_ct"), col("orphan_ct"), col("null_key_ct"))
  }

  private def refIntegrity(s: SparkSession, dir: String): DataFrame = {
    val audit = refIntegrityFor _
    audit("lineitem->orders", Tables(s, dir, "lineitem"), "l_orderkey",
        Tables(s, dir, "orders"), "o_orderkey")
      .unionByName(audit("orders->customer", Tables(s, dir, "orders"),
        "o_custkey", Tables(s, dir, "customer"), "c_custkey"))
      .unionByName(audit("customer->nation", Tables(s, dir, "customer"),
        "c_nationkey", Tables(s, dir, "nation"), "n_nationkey"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "j12_ref_integrity" -> refIntegrity,
    "j9_range_bucket_join" -> rangeBucketJoin,
    "j1_order_wide" -> orderWide,
    "j2_left_outer_returns" -> orderReturnsLeft,
    "j3_interval_join" -> intervalJoin,
    "j4_part_dim_lookup" -> partDim,
    "j5_dim_chain" -> dimChain,
    "j6_config_route" -> configRoute,
    "j7_anti_customers" -> custNoOrders,
    "j8_semi_parts_sold" -> partsSold,
    "j10_asof_attribution" -> asofAttribution,
    "j13_stale_asof" -> staleAsof,
    "j11_struct_dic_lookup" -> structDicLookup)

  /** S4/§1.3 ROW type: the HBase dimension row shape — one column family
    * packed as a nested struct (`info ROW<dic_name STRING>`,
    * BaseSQLApp.java:71-78) — accessed through the struct path
    * `dic.info.dic_name` (DwdTradeOrderRefund.java:80-82) after a
    * broadcast lookup join. */
  private def structDicLookup(s: SparkSession, dir: String): DataFrame = {
    val dic = Tables(s, dir, "region")
      .select(col("r_regionkey").as("dic_code"),
        struct(col("r_name").as("dic_name")).as("info"))
    Tables(s, dir, "nation")
      .join(broadcast(dic), col("n_regionkey") === col("dic_code"))
      .select(col("n_name"), col("info.dic_name").as("region_name"))
  }

  /** J10 (beyond-reference; the canonical as-of join Spark lacks as a
    * primitive): each purchase event matched to the user's latest view
    * event at-or-before it. Composed as the single-shuffle union trick:
    * tag both sides, sort within user by (time, tag), and carry the last
    * non-null view time forward with an ignoreNulls running window —
    * exactly the partitioned merge an AsOfJoinExec would run, expressed
    * with one Exchange(user_id) + one sort, no range cross-product.
    * Ties (view and purchase at the same microsecond) resolve view-first,
    * matching ASOF's `<=` bound; DuckDB's native ASOF LEFT JOIN is the
    * oracle. */
  private def asofAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val tagged = e.filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), nsToUs(col("ts")).as("us"),
        when(col("event_type") === "view", 0).otherwise(1).as("tag"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("tag"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    tagged
      .withColumn("v_us",
        last(when(col("tag") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("us").as("p_us"), col("v_us"),
        (col("us") - col("v_us")).as("gap_us"))
  }

  /** j13's staleness bound: an as-of match older than this is REJECTED
    * (1 hour in event micros) — the feature-store serving rule. */
  val asofStaleToleranceUs: Long = 3600L * 1000000L

  /** j13 (beyond-reference): tolerance-bounded as-of join — the
    * feature-store serving pattern j10's plain as-of lacks: "join the
    * user's latest view, but only if it is fresh enough" (a stale
    * feature is worse than no feature — training-serving skew). Each
    * purchase classifies as `fresh` (latest prior view within the
    * tolerance), `stale` (a prior view exists but too old — the match
    * is REJECTED), or `cold` (no prior view at all); the report folds
    * to per-outcome purchase counts and the mean matched-gap seconds —
    * the monitoring table a feature-serving SLA reads. Expressed over
    * the GENERIC [[asofJoinFor]] core (same single-Exchange
    * tagged-union, no range cross-product) — the classification is
    * the core's own tolerance `outcome`, so the facade
    * ([[graft.api.Graft.asofJoin]]) and this query cannot drift. */
  private def staleAsof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), nsToUs(col("ts")).as("p_us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), nsToUs(col("ts")).as("v_us"))
    asofJoinFor(purchases, views, "user_id", "p_us", "v_us",
        Some(asofStaleToleranceUs))
      .select(col("outcome"), (col("p_us") - col("asof_time")).as("gap_us"))
      .groupBy(col("outcome"))
      .agg(count(lit(1)).as("purchase_ct"),
        // exact integer gap sum, ONE division at the end — a float
        // accumulation would make the mean partition-order-sensitive
        round(sum(col("gap_us")).cast(DoubleType) /
          count(col("gap_us")) / 1000000.0, 6).as("mean_gap_sec"))
  }

  /** Generic as-of join core for ARBITRARY frames — the same
    * tagged-union + ignoreNulls-running-window recipe as
    * [[asofAttribution]] (j10, oracle-checked against DuckDB's native
    * ASOF JOIN), kept beside it so the two cannot drift: each left row
    * gets the latest right time <= its own time per key (`asof_time`,
    * null when no earlier right row exists) plus the j13 serving
    * classification `outcome`: `fresh` (a match within `tolerance`),
    * `stale` (a match exists but is older — the serving path should
    * reject it; `asof_time` still reports it so SLA monitors can
    * measure HOW stale), `cold` (no earlier right row). tolerance
    * None = every match is fresh (the plain as-of); Some(0) = only
    * exact-time matches are fresh. Exposed via
    * [[graft.api.Graft.asofJoin]]. */
  private[graft] def asofJoinFor(left: DataFrame, right: DataFrame,
      keyCol: String, leftTime: String, rightTime: String,
      tolerance: Option[Long] = None): DataFrame = {
    val l = left.select(col(keyCol).as("k"), col(leftTime).as("t"))
      .withColumn("tag", lit(1))
    val r = right.select(col(keyCol).as("k"), col(rightTime).as("t"))
      .withColumn("tag", lit(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("t"), col("tag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    r.unionByName(l)
      .withColumn("asof_time",
        last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("k").as(keyCol), col("t").as(leftTime), col("asof_time"),
        when(col("asof_time").isNull, "cold")
          .when(tolerance.map(tol => col("t") - col("asof_time") <= tol)
            .getOrElse(lit(true)), "fresh")
          .otherwise("stale").as("outcome"))
  }

  val oracles = Map(
    "j12_ref_integrity" -> {
      def edge(name: String, child: String, ck: String, parent: String,
          pk: String) =
        s"""SELECT '$name' AS fk_edge,
           |       CAST(count(*) AS BIGINT) AS child_ct,
           |       CAST(sum(CASE WHEN p.$pk IS NOT NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS matched_ct,
           |       CAST(sum(CASE WHEN c.$ck IS NOT NULL AND p.$pk IS NULL
           |                     THEN 1 ELSE 0 END)
           |            AS BIGINT) AS orphan_ct,
           |       CAST(sum(CASE WHEN c.$ck IS NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS null_key_ct
           |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
           |  ON c.$ck = p.$pk""".stripMargin
      Seq(edge("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("orders->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("customer->nation", "customer", "c_nationkey",
          "nation", "n_nationkey")).mkString("\nUNION ALL\n")
    },
    // the oracle states the range join PLAINLY (BETWEEN theta-join) —
    // proving the bucket decomposition computes exactly the naive
    // semantics
    "j9_range_bucket_join" ->
      s"""WITH bands AS (
         |  SELECT r AS band_id, r * $bandW AS lo, r * $bandW + $bandSpan AS hi
         |  FROM range(0, 20) t(r))
         |SELECT band_id, count(*) AS row_ct,
         |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS price_sum
         |FROM bands JOIN lineitem
         |  ON l_extendedprice >= lo AND l_extendedprice < hi
         |GROUP BY 1""".stripMargin,
    "j11_struct_dic_lookup" ->
      """SELECT n_name, r_name AS region_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "j10_asof_attribution" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id AS p_event_id, p.user_id, p.us AS p_us,
        |       v.us AS v_us, p.us - v.us AS gap_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.us <= p.us""".stripMargin,
    "j13_stale_asof" ->
      s"""WITH p AS (SELECT user_id, epoch_us(ts) AS us
         |           FROM events WHERE event_type = 'purchase'),
         |     v AS (SELECT user_id, epoch_us(ts) AS us
         |           FROM events WHERE event_type = 'view'),
         |m AS (SELECT p.us - v.us AS gap_us
         |      FROM p ASOF LEFT JOIN v
         |        ON p.user_id = v.user_id AND v.us <= p.us),
         |o AS (SELECT CASE WHEN gap_us IS NULL THEN 'cold'
         |                  WHEN gap_us <= $asofStaleToleranceUs
         |                    THEN 'fresh'
         |                  ELSE 'stale' END AS outcome, gap_us
         |      FROM m)
         |SELECT outcome, count(*) AS purchase_ct,
         |       round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us)
         |             / 1000000.0, 6) AS mean_gap_sec
         |FROM o GROUP BY 1""".stripMargin,
    "j1_order_wide" ->
      s"""SELECT o_orderpriority,
         |       CAST(SUM(${Oracle.money("l_extendedprice")} * (1 - ${Oracle.money("l_discount")})) AS DOUBLE) AS revenue,
         |       count(DISTINCT o_orderkey) AS order_ct,
         |       count(*) AS line_ct
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin,
    "j2_left_outer_returns" ->
      s"""WITH returns AS (
         |  SELECT l_orderkey, ${Oracle.moneySum("l_extendedprice")} AS ret_amount
         |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)
         |SELECT o_orderstatus,
         |       CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched_ct,
         |       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched_ct,
         |       CAST(SUM(${Oracle.money("COALESCE(ret_amount, 0)")}) AS DOUBLE) AS ret_amount_sum
         |FROM orders LEFT JOIN returns ON o_orderkey = l_orderkey
         |GROUP BY 1""".stripMargin,
    "j3_interval_join" ->
      s"""WITH p AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS p_id,
         |             ${Oracle.sec()} AS p_sec
         |           FROM events WHERE event_type = 'purchase'),
         |     c AS (SELECT user_id AS c_user, epoch_us(ts) AS c_us
         |           FROM events WHERE event_type = 'click')
         |SELECT ${Oracle.fmtDate("p_sec")} AS cur_date,
         |       count(*) AS pair_ct,
         |       count(DISTINCT p_id) AS purchase_ct
         |FROM p JOIN c ON user_id = c_user
         |  AND c_us >= p_us - 1800000000 AND c_us <= p_us + 5000000
         |GROUP BY 1""".stripMargin,
    "j4_part_dim_lookup" ->
      s"""SELECT p_brand,
         |       ${Oracle.moneySum("l_extendedprice")} AS revenue,
         |       CAST(SUM(${Oracle.money("l_quantity")}) AS DOUBLE) AS qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1""".stripMargin,
    "j5_dim_chain" ->
      s"""SELECT r_name, n_name, p_type,
         |       ${Oracle.moneySum("l_extendedprice")} AS revenue,
         |       count(*) AS line_ct
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2, 3""".stripMargin,
    "j6_config_route" ->
      """WITH config AS (
        |  SELECT DISTINCT event_type, 'dwd_' || event_type AS sink_table
        |  FROM events WHERE event_type <> 'error')
        |SELECT sink_table, count(*) AS routed_ct,
        |       count(DISTINCT user_id) AS user_ct
        |FROM events JOIN config USING (event_type)
        |GROUP BY 1""".stripMargin,
    "j7_anti_customers" ->
      """SELECT c_mktsegment, count(*) AS cust_ct
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,
    "j8_semi_parts_sold" ->
      """SELECT p_brand, count(*) AS part_ct
        |FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY 1""".stripMargin)
}
