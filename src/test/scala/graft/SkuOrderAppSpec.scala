package graft

import org.apache.spark.sql.functions._
import graft.streaming.SkuOrderApp

/** The composed DwsTradeSkuOrderWindow twin: ONE streaming program
  * (dedup → 7-day sku window DECIMAL sums → broadcast dim cascade →
  * day-partitioned store) reconciled against its batch twin on
  * watermark-closed windows. */
class SkuOrderAppSpec extends SparkSuite {

  test("sku-order app: streamed store equals batch twin on closed windows") {
    val src = java.nio.file.Files.createTempDirectory("soa_src").toString
    val out = java.nio.file.Files.createTempDirectory("soa_out").toString
    val ckp = java.nio.file.Files.createTempDirectory("soa_ckp").toString
    // arrival order = the Kafka per-key ordering contract (the retained
    // op arrives first per detail id), stated as a total sort so the
    // streaming first-seen dedup picks exactly the batch twin's rn=1 row
    Tables(spark, sf, "lineitem")
      .repartition(1)
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").desc, col("l_extendedprice").desc,
        col("l_partkey").desc, col("l_suppkey").desc,
        col("l_quantity").desc)
      .write.mode("overwrite").parquet(s"$src/lineitem.parquet")

    val sq = SkuOrderApp.run(spark, src, sf, out, ckp)
    sq.processAllAvailable()
    sq.stop()

    val cols = Seq("stt", "edt", "cur_date", "sku_id", "sku_name",
      "trademark_name", "category3_name", "category2_name",
      "category1_name", "order_ct", "original_amount",
      "activity_reduce_amount", "coupon_reduce_amount", "order_amount")
    // partition-column type inference reads cur_date back as DATE
    val streamed = spark.read.parquet(out)
      .withColumn("cur_date", col("cur_date").cast("string"))
      .select(cols.map(col): _*)

    val batch = SkuOrderApp.batch(spark, sf)
    // append emits only windows CLOSED by the final watermark
    val wm = Tables(spark, sf, "lineitem")
      .agg(date_format(max(col("l_shipdate")) - expr("INTERVAL 1 DAY"),
        "yyyy-MM-dd HH:mm:ss")).head.getString(0)
    val closed = batch.filter(col("edt") <= lit(wm)).select(cols.map(col): _*)

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0,
      "streamed store != batch twin on closed windows")

    // the dim cascade runs as broadcast hash joins (no shuffle after
    // the single window-agg exchange)
    val plan = batch.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"expected >=4 broadcast joins in the cascade:\n$plan")
  }
}
