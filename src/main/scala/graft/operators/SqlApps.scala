package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryModule, Tables}

/** The Flink-SQL application lifecycle (SURVEY.md §3.2): register source
  * tables as temp views (≈ BaseSQLApp.readOdsDb DDL +
  * createTemporaryView), then run SQL text through the Catalyst pipeline
  * — parse → analyze (views as catalog) → optimize → physical plan —
  * exactly the Calcite path the reference's six DWD fact apps ride.
  *
  * The flagship is the dwd_trade_order_detail wide table
  * (DwdTradeOrderDetail.java:30-108): a multi-way join producing a
  * row-per-fact DETAIL output (not an aggregate), with the reference's
  * string-typed DWD columns (§1.3: "STRING dominant — even amounts in
  * DWD are strings") and the split_total_amount DECIMAL computation.
  *
  * Scale notes: detail-wide outputs dominate DWD volume; the join keys
  * (l_orderkey = o_orderkey, o_custkey = c_custkey) are the natural
  * bucketing keys at 100 TB — co-partitioned writes make the downstream
  * DWS aggregations shuffle-free. No aggregation here: the plan is
  * scan → (broadcast|shuffle) hash join ×2 → project, all inside
  * whole-stage codegen.
  */
object SqlApps extends QueryModule {

  private def registerViews(s: SparkSession, dir: String,
      names: Seq[String]): Unit =
    names.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))

  /** The order-detail wide table as SQL text (≈ executeSql + sqlQuery).
    * Amounts stay DECIMAL inside the layer (split_total_amount_dec) and
    * are surfaced as DOUBLE only at the output edge — re-quantizing a
    * DOUBLE back to DECIMAL is lossy at .xx5 ties and engine-dependent,
    * so downstream consumers aggregate the decimal column. */
  private def detailView(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, Seq("lineitem", "orders", "customer"))
    s.sql("""
      SELECT CAST(l_orderkey AS STRING) || '-' || CAST(l_linenumber AS STRING)
               AS id,
             CAST(l_orderkey AS STRING) AS order_id,
             CAST(o_custkey AS STRING) AS user_id,
             CAST(c_nationkey AS STRING) AS province_id,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2))) AS split_total_amount_dec
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      """)
  }

  private def dwdOrderDetail(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, Seq("lineitem", "orders", "customer"))
    s.sql("""
      SELECT CAST(l_orderkey AS STRING) || '-' || CAST(l_linenumber AS STRING)
               AS id,
             CAST(l_orderkey AS STRING) AS order_id,
             CAST(o_custkey AS STRING) AS user_id,
             CAST(l_partkey AS STRING) AS sku_id,
             CAST(c_nationkey AS STRING) AS province_id,
             date_format(o_orderdate, 'yyyy-MM-dd') AS date_id,
             CAST(l_quantity AS STRING) AS sku_num,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
               AS split_original_amount,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE)
               AS split_activity_amount,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE)
               AS split_total_amount,
             unix_timestamp(o_orderdate) AS ts
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      """)
  }

  /** The serving /province endpoint as SQL text over the detail view —
    * proving the §3.3 lifecycle composes with §3.2 outputs. */
  private def sqlProvinceRollup(s: SparkSession, dir: String): DataFrame = {
    detailView(s, dir).createOrReplaceTempView("dwd_trade_order_detail")
    s.sql("""
      SELECT province_id,
             CAST(SUM(split_total_amount_dec) AS DOUBLE) AS order_amount,
             COUNT(DISTINCT order_id) AS order_ct
      FROM dwd_trade_order_detail
      GROUP BY province_id
      """)
  }

  /** DwdInteractionCommentInfo (the dict-lookup fact app,
    * DwdInteractionCommentInfo.java:25-52): row-level detail enriched by
    * a broadcast dictionary lookup (base_dic → dic_name) — FOR
    * SYSTEM_TIME AS OF proctime semantics, detail output (no agg). The
    * dictionary derives from nation (bounded, HBase-dim-shaped). */
  private def dwdCommentInfo(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir, Seq("orders", "customer", "nation"))
    s.sql("""
      SELECT CAST(o_orderkey AS STRING) AS id,
             CAST(o_custkey AS STRING) AS user_id,
             o_orderstatus AS appraise,
             n_name AS appraise_name,
             date_format(o_orderdate, 'yyyy-MM-dd') AS date_id
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      """)
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "sql_dwd_order_detail" -> dwdOrderDetail,
    "sql_dwd_comment_info" -> dwdCommentInfo,
    "sql_province_rollup" -> sqlProvinceRollup)

  val oracles = Map(
    "sql_dwd_order_detail" ->
      """SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS id,
        |       CAST(l_orderkey AS VARCHAR) AS order_id,
        |       CAST(o_custkey AS VARCHAR) AS user_id,
        |       CAST(l_partkey AS VARCHAR) AS sku_id,
        |       CAST(c_nationkey AS VARCHAR) AS province_id,
        |       strftime(o_orderdate, '%Y-%m-%d') AS date_id,
        |       CAST(l_quantity AS VARCHAR) AS sku_num,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS split_original_amount,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS split_activity_amount,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |            * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS split_total_amount,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS ts
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "sql_dwd_comment_info" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |       CAST(o_custkey AS VARCHAR) AS user_id,
        |       o_orderstatus AS appraise,
        |       n_name AS appraise_name,
        |       strftime(o_orderdate, '%Y-%m-%d') AS date_id
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "sql_province_rollup" ->
      """WITH detail AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS province_id,
        |         CAST(l_orderkey AS VARCHAR) AS order_id,
        |         CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |           * (1 + CAST(l_tax AS DECIMAL(18,2))) AS split_total_amount_dec
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey)
        |SELECT province_id,
        |       CAST(SUM(split_total_amount_dec) AS DOUBLE) AS order_amount,
        |       COUNT(DISTINCT order_id) AS order_ct
        |FROM detail GROUP BY 1""".stripMargin)
}
