package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{BaseDbApp, BaseLogApp, DimApp, ProvinceOrderApp,
  StatefulStreams}

/** The reference operates ~12 streaming applications SIMULTANEOUSLY
  * against shared Kafka topics (BaseApp.java:22-65 — every app is its
  * own main(), all consuming topic_db / topic_log at once). Every
  * composed app in this repo is spec-proven in isolation; this suite
  * proves the missing property: N StreamingQueries in ONE SparkSession
  * over ONE shared input stream keep their checkpoints, state stores,
  * and sinks fully isolated — each concurrent store is byte-equal to
  * the same app's isolated run over the same input. */
class ConcurrentAppsSpec extends SparkSuite {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def assertSame(tag: String, got: DataFrame, want: DataFrame)
      : Unit = {
    assert(got.count() > 0, s"$tag: concurrent store is empty")
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      s"$tag: concurrent run != isolated run")
  }

  test("five concurrent apps over one shared stream equal their isolated runs") {
    // ONE shared CDC op-log (the reference's single topic_db): the
    // union of both config-driven apps' envelope streams — each app's
    // broadcast config probe routes ONLY its own tables and must drop
    // the other app's traffic; plus the shared log stream (topic_log)
    val src = tmp("conc_src")
    DimApp.envelopes(spark, sf).union(BaseDbApp.envelopes(spark, sf))
      .write.mode("overwrite").parquet(s"$src/envelopes.parquet")
    BaseLogApp.logLines(spark, sf).write.mode("overwrite")
      .parquet(s"$src/logs.parquet")

    // isolated twins, sequentially (each over the SAME shared input)
    val (isoDim, isoDb, isoLog, isoProv) =
      (tmp("iso_dim"), tmp("iso_db"), tmp("iso_log"), tmp("iso_prov"))
    Seq(
      DimApp.run(spark, src, isoDim, tmp("ick1")),
      BaseDbApp.run(spark, src, isoDb, tmp("ick2")),
      BaseLogApp.run(spark, src, isoLog, tmp("ick3")),
      ProvinceOrderApp.run(spark, sf, isoProv, tmp("ick4"))
    ).foreach { sq => sq.processAllAvailable(); sq.stop() }
    val isoWin = runStreamNamed(
      StatefulStreams.windowedCounts(spark, sf), "conc_win_iso")

    // concurrent run: all five queries live at once in this session
    val (conDim, conDb, conLog, conProv) =
      (tmp("con_dim"), tmp("con_db"), tmp("con_log"), tmp("con_prov"))
    val queries = Seq(
      DimApp.run(spark, src, conDim, tmp("cck1")),
      BaseDbApp.run(spark, src, conDb, tmp("cck2")),
      BaseLogApp.run(spark, src, conLog, tmp("cck3")),
      ProvinceOrderApp.run(spark, sf, conProv, tmp("cck4")),
      StatefulStreams.windowedCounts(spark, sf).writeStream
        .outputMode("append").format("memory")
        .queryName("conc_win_con").start())
    assert(spark.streams.active.count(queries.contains) == 5,
      "all five queries must be registered concurrently")
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    // DIM stores: one merge-maintained table per configured dim
    DimApp.configRows.foreach { cfg =>
      assertSame(s"dim/${cfg.sink_table}",
        DimApp.store(spark, conDim, cfg.sink_table)
          .select(col("id"), explode(col("data"))),
        DimApp.store(spark, isoDim, cfg.sink_table)
          .select(col("id"), explode(col("data"))))
    }
    // dynamic-routed DWD store (maps compare exploded)
    assertSame("basedb",
      BaseDbApp.store(spark, conDb)
        .select(col("sink_table"), col("data")("id"), explode(col("data"))),
      BaseDbApp.store(spark, isoDb)
        .select(col("sink_table"), col("data")("id"), explode(col("data"))))
    // all six log routes
    BaseLogApp.routeNames.foreach { r =>
      assertSame(s"log/$r",
        spark.read.parquet(s"$conLog/$r"),
        spark.read.parquet(s"$isoLog/$r"))
    }
    // DWS window stores
    assertSame("province",
      spark.read.parquet(conProv), spark.read.parquet(isoProv))
    assertSame("windowed_counts",
      spark.table("conc_win_con"), isoWin)
  }

  private def runStreamNamed(df: DataFrame, name: String): DataFrame = {
    val sq = df.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    sq.processAllAvailable()
    sq.stop()
    spark.table(name)
  }
}
