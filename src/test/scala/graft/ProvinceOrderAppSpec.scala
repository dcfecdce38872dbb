package graft

import org.apache.spark.sql.functions._
import graft.streaming.ProvinceOrderApp

/** The §7.3 end-to-end slice as one streaming app: stream == batch on
  * closed windows, day-partitioned store, pruned serving read. */
class ProvinceOrderAppSpec extends SparkSuite {

  test("province-order app: streamed store equals batch twin on closed windows") {
    val out = java.nio.file.Files.createTempDirectory("poa_out").toString
    val ckp = java.nio.file.Files.createTempDirectory("poa_ckp").toString
    val sq = ProvinceOrderApp.run(spark, sf, out, ckp)
    sq.processAllAvailable()
    sq.stop()
    // partition-column type inference reads cur_date back as DATE
    val streamed = spark.read.parquet(out)
      .select(col("stt"), col("edt"), col("cur_date").cast("string"),
        col("province_name"), col("order_ct"), col("order_amount"))

    val o = Tables(spark, sf, "orders")
    val batch = ProvinceOrderApp.transform(spark, o, sf)
    // append emits only windows CLOSED by the final watermark
    val wm = o.agg(max(to_timestamp(col("o_orderdate"))) -
        expr("INTERVAL 1 DAY")).head.getTimestamp(0)
    val closed = batch.filter(
      to_timestamp(col("edt"), "yyyy-MM-dd HH:mm:ss") <= lit(wm))
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0,
      "streamed store != batch twin on closed windows")
    assert(streamed.count() > 0)

    // the store is genuinely day-partitioned and the serving read prunes
    val day = streamed.select(col("cur_date")).head.getString(0)
    val serving = ProvinceOrderApp.gmvOfDay(spark, out, day)
    val plan = serving.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cur_date") ||
      plan.contains(s"cur_date%23") || plan.contains("PartitionFilters: ["),
      s"serving read should prune on cur_date:\n$plan")
    assert(serving.count() > 0)
    // serving totals match a direct filter over the store
    val direct = streamed.filter(col("cur_date") === day)
      .groupBy(col("province_name"))
      .agg(sum(col("order_amount")).as("order_amount"),
        sum(col("order_ct")).as("order_ct"))
    assert(serving.exceptAll(direct).count() == 0 &&
      direct.exceptAll(serving).count() == 0)
  }
}
