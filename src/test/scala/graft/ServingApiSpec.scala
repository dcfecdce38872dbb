package graft

import org.apache.spark.sql.functions._
import graft.operators.ServingApi
import graft.streaming.KeywordApp

/** End-to-end serving layer + the flagship keyword streaming app. */
class ServingApiSpec extends SparkSuite {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("serving store is day-partitioned and queries prune partitions") {
    val store = tmp("dws_store")
    ServingApi.buildStore(spark, sf, store)
    val day = spark.read.parquet(store)
      .select(col("cur_date").cast("string")).orderBy(col("cur_date"))
      .head.getString(0)
    val g = ServingApi.gmv(spark, store, day)
    // partition pruning: the one-day filter must land in PartitionFilters
    val plan = g.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cur_date"), s"no partition pruning:\n$plan")
    // and the number agrees with computing from source
    val expected = Tables(spark, sf, "orders")
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd") === day)
      .agg(sum(graft.functions.Fns.money(col("o_totalprice")))
        .cast("double")).head.getDouble(0)
    assert(g.head.getDouble(0) == expected)
    // province + topN endpoints return sane shapes
    assert(ServingApi.province(spark, store, day).count() >= 1)
    assert(ServingApi.topProvinces(spark, store, "1997-01-01",
      "1997-12-31", 5).count() <= 5)
  }

  test("keyword app: streamed windows equal the batch twin (closed set)") {
    val out = tmp("kw_out")
    val sq = KeywordApp.run(spark, sf, out, tmp("kw_ck"))
    sq.processAllAvailable(); sq.stop()
    val cols = Seq("stt", "edt", "cur_date", "keyword", "keyword_count")
    val streamed = spark.read.parquet(out)
      .withColumn("cur_date", col("cur_date").cast("string"))
      .select(cols.map(col): _*)
    val batch = KeywordApp.batch(spark, sf).select(cols.map(col): _*)
    // append mode withholds windows beyond the final watermark
    assert(streamed.exceptAll(batch).count() == 0,
      "stream emitted a window row the batch twin lacks")
    assert(batch.exceptAll(streamed).count() <= 10,
      "stream withheld more than the open tail")
    // tokens fan out: every phrase yields 3 keywords
    val views = Tables(spark, sf, "events")
      .filter(col("event_type") === "view").count()
    assert(batch.agg(sum(col("keyword_count"))).head.getLong(0) == views * 3)
  }

  test("approx_count_distinct sketch lands within 5% of exact") {
    val e = Tables(spark, sf, "events")
    val both = e.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head
    val (exact, approx) = (both.getLong(0), both.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"HLL error too large: exact=$exact approx=$approx")
  }
}
