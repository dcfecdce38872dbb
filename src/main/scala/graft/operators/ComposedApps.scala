package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryModule
import graft.functions.Oracle

/** Oracle registration for the COMPOSED end-to-end applications (the
  * whole-program twins of the reference's biggest apps, not single
  * operators): a17 states the full DwsTradeSkuOrderWindow pipeline —
  * deterministic dedup → 7-day sku window DECIMAL sums → dim cascade —
  * in one SQL statement over the same tables
  * ([[graft.streaming.SkuOrderApp]]; reference
  * DwsTradeSkuOrderWindow.java:122-621). The streaming/batch
  * reconciliation lives in SkuOrderAppSpec; DimApp's multi-table store
  * pipeline is spec-verified (no single-result-set SQL shape). */
object ComposedApps extends QueryModule {

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "a17_sku_order_window" ->
      ((s, dir) => graft.streaming.SkuOrderApp.batch(s, dir)))

  private val wsUs = 7L * 86400L * 1000000L // 7-day tumble in micros

  val oracles = Map(
    "a17_sku_order_window" ->
      s"""WITH ded AS (
         |  SELECT l_partkey, l_shipdate, l_extendedprice, l_discount, l_tax
         |  FROM (
         |    SELECT *, row_number() OVER (
         |        PARTITION BY l_orderkey, l_linenumber
         |        ORDER BY l_returnflag DESC, l_extendedprice DESC,
         |                 l_partkey DESC, l_suppkey DESC, l_quantity DESC)
         |      AS rn
         |    FROM lineitem) WHERE rn = 1),
         |agg AS (
         |  SELECT ((epoch_us(l_shipdate) // $wsUs) * ${7 * 86400}) AS ws,
         |         l_partkey AS sku_id, count(*) AS order_ct,
         |         SUM(${Oracle.money("l_extendedprice")}) AS o_sum,
         |         SUM(${Oracle.money("l_extendedprice")} *
         |             ${Oracle.money("l_discount")}) AS a_sum,
         |         SUM(${Oracle.money("l_extendedprice")} *
         |             ${Oracle.money("l_tax")}) AS c_sum
         |  FROM ded GROUP BY 1, 2)
         |SELECT ${Oracle.fmtTs("ws")} AS stt,
         |       ${Oracle.fmtTs(s"ws + ${7 * 86400}")} AS edt,
         |       ${Oracle.fmtDate("ws")} AS cur_date,
         |       sku_id, p_name AS sku_name,
         |       'MFGR#' || substr(p_brand, 7, 1) AS trademark_name,
         |       p_type AS category3_name,
         |       array_to_string((string_split(p_type, ' '))[1:2], ' ')
         |         AS category2_name,
         |       string_split(p_type, ' ')[1] AS category1_name,
         |       order_ct,
         |       CAST(o_sum AS DOUBLE) AS original_amount,
         |       CAST(a_sum AS DOUBLE) AS activity_reduce_amount,
         |       CAST(c_sum AS DOUBLE) AS coupon_reduce_amount,
         |       CAST(o_sum - a_sum - c_sum AS DOUBLE) AS order_amount
         |FROM agg JOIN part ON sku_id = p_partkey""".stripMargin)
}
