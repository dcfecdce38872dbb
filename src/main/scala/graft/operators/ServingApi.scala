package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns

/** The publisher/serving layer (§3.3): the three REST endpoints'
  * query methods (TradeStatsController /gmv, /province;
  * TrafficStatsController /ch — gmall2024-publisher mapper SQL), exposed
  * as an API over a day-partitioned DWS store. `partition par#{date}`
  * becomes a cur_date predicate; because the store is
  * partitionBy("cur_date"), Catalyst turns it into PartitionFilters —
  * the scan never opens other days' files (asserted in ServingApiSpec).
  */
object ServingApi {
  import Fns._

  /** Materialize the DWS order rollup day-partitioned (the Doris table). */
  def buildStore(s: SparkSession, dir: String, storeDir: String): Unit =
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"),
        col("n_name").as("province_name"), col("o_orderkey"),
        money(col("o_totalprice")).as("order_amount"))
      .write.mode("overwrite").partitionBy("cur_date").parquet(storeDir)

  /** GET /gmv?date=… → one-day pruned sum. */
  def gmv(s: SparkSession, storeDir: String, date: String): DataFrame =
    s.read.parquet(storeDir)
      .filter(col("cur_date") === date)
      .agg(sum(col("order_amount")).cast("double").as("gmv"))

  /** GET /province?date=… → per-province amounts for one day. */
  def province(s: SparkSession, storeDir: String, date: String): DataFrame =
    s.read.parquet(storeDir)
      .filter(col("cur_date") === date)
      .groupBy(col("province_name"))
      .agg(sum(col("order_amount")).cast("double").as("order_amount"),
        countDistinct(col("o_orderkey")).as("order_ct"))

  /** GET /province over a DWS ROLLUP store (the live
    * [[graft.streaming.ProvinceOrderApp]] sink: one row per
    * (window, province) with pre-aggregated order_ct/order_amount —
    * the reference's dws_trade_province_order_window Doris table):
    * counts are additive across windows, so the day rollup SUMS them
    * (the detail store's countDistinct is already folded in). */
  def provinceDws(s: SparkSession, storeDir: String, date: String)
      : DataFrame =
    s.read.parquet(storeDir)
      .filter(col("cur_date") === date)
      .groupBy(col("province_name"))
      .agg(sum(col("order_amount")).cast("double").as("order_amount"),
        sum(col("order_ct")).as("order_ct"))

  /** GET /ch?limit=N → top-N provinces by order count, date-ranged. */
  def topProvinces(s: SparkSession, storeDir: String, from: String,
      to: String, limit: Int): DataFrame =
    s.read.parquet(storeDir)
      .filter(col("cur_date") >= from && col("cur_date") <= to)
      .groupBy(col("province_name"))
      .agg(countDistinct(col("o_orderkey")).as("order_ct"))
      .orderBy(col("order_ct").desc, col("province_name"))
      .limit(limit)
}
