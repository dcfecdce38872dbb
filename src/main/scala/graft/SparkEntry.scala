package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.Fns

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family lives in its own [[QueryModule]]; this object is
  * only the registry. Operator-id ↔ query mapping: COVERAGE.md.
  */
object SparkEntry {

  private[graft] val modules: Seq[QueryModule] = Seq(
    WindowAggs, StatefulTwins, Joins, EnvelopeOps, TextOps, DedupOps,
    VectorOps, Multimodal, Serving, TypedAggs, SqlApps, ScalePatterns,
    DebeziumOps, CurationOps, ComposedApps, QualityOps, SketchOps)

  /** Flagship query (SURVEY.md §7.3 minimum end-to-end slice): order facts
    * → dedup-shaped distinct → day window → decimal sum + exact distinct →
    * broadcast dim chain → province/region rollup. Driver smoke-checks
    * rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"),
        col("r_name"), col("n_name"))
      .agg(countDistinct(col("o_orderkey")).as("order_ct"),
        Fns.moneySum(col("o_totalprice")).as("order_amount"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query has one (the simhash bit
    * votes and the IVF probe pipeline are replayed in SQL too). */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
