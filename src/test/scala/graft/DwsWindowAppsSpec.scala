package graft

import org.apache.spark.sql.functions._
import graft.streaming.{CartAddUuApp, HomeDetailApp, StatefulStreams,
  TrafficPageViewApp}

/** The three remaining composed DWS window apps, each reconciled
  * streaming-vs-batch: cart-add UU (keyed day-change emission),
  * home/detail UV (double keyed state), and the 4-dim traffic window
  * (lastVisitDate + first-ever-day state chained into a keyed window). */
class DwsWindowAppsSpec extends SparkSuite {

  private def assertSame(tag: String,
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() > 0, s"$tag: empty stream result")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"$tag: streamed != batch twin")
  }

  test("cart-add-uu app: streamed day-change emission equals lag twin") {
    val uu = CartAddUuApp.uuStream(
      CartAddUuApp.cartAdds(StatefulStreams.eventStream(spark, sf)))
    val sq = uu.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ca_uu").start()
    sq.processAllAvailable(); sq.stop()
    val batch = CartAddUuApp.uuBatch(
      CartAddUuApp.cartAdds(Tables(spark, sf, "events")))
    assertSame("cart_uu", spark.table("ca_uu"), batch)
    // at most one uu FLAG per (user, day) — unflagged events flow
    // through for watermark progress but never double-count a user
    val dup = spark.table("ca_uu").filter(col("uu") === 1)
      .groupBy(col("user_id"),
        graft.functions.Fns.curDate(col("sec")).as("day"))
      .count().filter(col("count") > 1)
    assert(dup.count() == 0)
  }

  test("home-detail app: double-state flags equal the per-page lag twin") {
    val flags = HomeDetailApp.flagStream(
      HomeDetailApp.pageViews(StatefulStreams.eventStream(spark, sf)))
    val sq = flags.toDF().writeStream.outputMode("append")
      .format("memory").queryName("hd_flags").start()
    sq.processAllAvailable(); sq.stop()
    val batch = HomeDetailApp.flagBatch(
      HomeDetailApp.pageViews(Tables(spark, sf, "events")))
    assertSame("home_detail", spark.table("hd_flags"), batch)
    // a row fires at most one flag; each (user, page)'s flag fires at
    // most once per day (zero-flag rows exist purely for event-time
    // progress)
    assert(spark.table("hd_flags")
      .filter(col("home_uv") + col("detail_uv") > 1).count() == 0)
    val pv = HomeDetailApp.pageViews(Tables(spark, sf, "events"))
      .select(col("user_id"), col("sec").as("psec"),
        col("event_id").as("pid"))
    val dupFlags = spark.table("hd_flags")
      .filter(col("home_uv") + col("detail_uv") === 1)
      .join(pv, col("sec") === col("psec") && col("event_id") === col("pid"))
      .groupBy(col("user_id"), col("home_uv"),
        graft.functions.Fns.curDate(col("sec")).as("day"))
      .count().filter(col("count") > 1)
    assert(dupFlags.count() == 0)
  }

  test("traffic app: uv/is_new state measures equal the window-fn twin") {
    val m = TrafficPageViewApp.measureStream(
      TrafficPageViewApp.pageViews(StatefulStreams.eventStream(spark, sf)))
    val sq = m.toDF().writeStream.outputMode("append")
      .format("memory").queryName("tpv_m").start()
    sq.processAllAvailable(); sq.stop()
    val batch = TrafficPageViewApp.measureBatch(
      TrafficPageViewApp.pageViews(Tables(spark, sf, "events")))
    assertSame("traffic_pv", spark.table("tpv_m"), batch)
    // uv fires exactly once per (user, day); is_new only on the first day
    val streamed = spark.table("tpv_m")
    val uvPerDay = streamed.filter(col("uv") === 1)
      .groupBy(col("user_id"),
        graft.functions.Fns.curDate(col("sec")).as("day"))
      .count().filter(col("count") > 1)
    assert(uvPerDay.count() == 0)
    val firstDays = streamed.groupBy(col("user_id"))
      .agg(min(graft.functions.Fns.curDate(col("sec"))).as("d0"))
      .withColumnRenamed("user_id", "uid")
    assert(streamed.filter(col("is_new") === 1)
      .join(firstDays, col("user_id") === col("uid"))
      .filter(graft.functions.Fns.curDate(col("sec")) =!= col("d0"))
      .count() == 0)
  }
}
