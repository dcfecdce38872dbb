package graft

import org.apache.spark.sql.functions._
import graft.streaming.BaseLogApp

/** The composed DwdBaseLog twin: one log stream → dirty side-output →
  * keyed is_new fix → six routes, each reconciled against the batch
  * twin (window-function state machine + shared parse/split code). */
class BaseLogAppSpec extends SparkSuite {

  test("base-log app: every streamed route equals its batch twin") {
    val src = java.nio.file.Files.createTempDirectory("bl_src").toString
    val out = java.nio.file.Files.createTempDirectory("bl_out").toString
    val ckp = java.nio.file.Files.createTempDirectory("bl_ckp").toString
    BaseLogApp.logLines(spark, sf).write.mode("overwrite")
      .parquet(s"$src/logs.parquet")

    val sq = BaseLogApp.run(spark, src, out, ckp)
    sq.processAllAvailable()
    sq.stop()

    BaseLogApp.routeNames.foreach { r =>
      val want = BaseLogApp.batchRoute(spark, sf, r)
      val got = spark.read.parquet(s"$out/$r")
        .select(want.columns.map {
          case "cur_date" => col("cur_date").cast("string").as("cur_date")
          case c => col(c)
        }: _*)
      assert(got.count() > 0, s"route $r is empty")
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0, s"route $r != batch twin")
    }

    // structural invariants of the split
    val page = spark.read.parquet(s"$out/page")
    val start = spark.read.parquet(s"$out/start")
    val events = Tables(spark, sf, "events")
    val signups = events.filter(col("event_type") === "signup" &&
      pmod(col("event_id"), lit(97L)) =!= 0).count()
    val corrupt = events.filter(pmod(col("event_id"), lit(97L)) === 0).count()
    assert(start.count() == signups, "start route = non-corrupt signups")
    assert(spark.read.parquet(s"$out/dirty").count() == corrupt)
    // start and page are exclusive and exhaustive over clean records
    assert(page.count() + start.count() ==
      events.count() - corrupt)
    // display fan-out: one row per display element of view events
    val viewK = events.filter(col("event_type") === "view" &&
        pmod(col("event_id"), lit(97L)) =!= 0)
      .select((pmod(get_json_object(col("props"), "$.k").cast("long"),
        lit(3L)) + 1).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(spark.read.parquet(s"$out/display").count() == viewK)
    // the fix actually rewrites claims: some claimed-1 records became 0
    val claimedOnes = events.filter(pmod(col("event_id"), lit(3L)) =!= 0 &&
      pmod(col("event_id"), lit(97L)) =!= 0).count()
    val fixedOnes = page.filter(col("is_new") === 1).count() +
      start.filter(col("is_new") === 1).count()
    assert(fixedOnes < claimedOnes, "is_new fix should demote repeats")

    // DWD→DWS chaining: the page-route store feeds the downstream
    // windowed DWS app AS A STREAM, reconciled against the batch twin
    // on closed windows — the reference's layered topic topology
    val sq2 = BaseLogApp.pageViewWindow(spark, s"$out/page")
      .writeStream.outputMode("append").format("memory")
      .queryName("pv_win").start()
    sq2.processAllAvailable()
    sq2.stop()
    val streamedWin = spark.table("pv_win")
    val pageBatch = BaseLogApp.batchRoute(spark, sf, "page")
    val wm = pageBatch.agg(max(timestamp_millis(col("ts_ms"))) -
      expr("INTERVAL 3 SECONDS")).head.getTimestamp(0)
    val closedWin = BaseLogApp.pageViewAgg(pageBatch)
      .filter(col("edt") <= lit(wm))
    assert(streamedWin.count() > 0)
    assert(streamedWin.exceptAll(closedWin).count() == 0 &&
      closedWin.exceptAll(streamedWin).count() == 0,
      "chained DWS window != batch twin on closed windows")
  }
}
