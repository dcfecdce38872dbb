package graft

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{BaseDbApp, BaseLogApp, CartAddUuApp, DimApp,
  HomeDetailApp, KeywordApp, ProvinceOrderApp, SkuOrderApp,
  StatefulStreams, TrafficPageViewApp, UserLoginApp}

/** Streaming-path benchmark — the axis every BENCH_r* artifact missed:
  * the reference is a STREAMING warehouse (BaseApp.java:22-65; ~12
  * always-on dataflow programs), and until round 9 only the batch
  * twins were timed. This main replays the testdata through all 12
  * composed apps as a SHARDED file stream (one shard per micro-batch
  * via the `graft.stream.maxFilesPerTrigger` session knob, shards cut
  * along each source's event-time order — the ordered replay a
  * per-partition-ordered topic delivers) and records, per app:
  *
  *  - input rows, wall seconds, rows/sec (the throughput number),
  *  - micro-batch count and mean/max batch duration (per-batch
  *    planning overhead and stragglers),
  *  - state rows + state bytes at end of run (the engine's own
  *    StateOperatorProgress — what grows unbounded when state-store
  *    discipline breaks),
  *  - end-to-end freshness for the five windowed DWS apps: the max
  *    batches-after-first-eligible delay over every emitted window
  *    (the StreamingSpec serving-freshness contract, now a recorded
  *    number; 0 = every window visible in the first batch its
  *    watermark allows).
  *
  * Plus ONE concurrent pass — the full 12-app topology live at once,
  * the reference's actual operating mode — recording the topology
  * wall-clock next to the sequential sum (pipelining evidence: on a
  * shared cluster the fleet must interleave, not serialize).
  *
  * Artifacts: STREAM_BENCH.json (at SPARK_GRAFT_SF_DIR, default
  * sf0.1) and STATE_LEDGER.tsv (state rows/bytes at sf0.01 vs the
  * big scale — the cross-scale growth ledger for STATE, sibling of
  * SCALE_LEDGER's shuffle ledger, measured on the SAME 10× step as
  * the batch evidence). StreamBenchSpec enforces floors on
  * the committed artifacts; regenerate per round:
  * `sbt "runMain graft.StreamBench"`. */
object StreamBench {

  /** Micro-batches per app (shards per source). */
  val shards = 4

  /** State-ledger growth rule (PerfSpec-style recompute, never a
    * stored verdict): state rows at the big scale may reach
    * [[maxGrowthFactor]] × the 10× input step before flagging, above
    * an absolute floor below which ratios are noise. */
  val inputRatio = 10.0
  val maxGrowthFactor = 1.3
  val stateRowFloor = 10000L

  def flaggedState(rowsSmall: Long, rowsBig: Long): Boolean =
    rowsBig > stateRowFloor &&
      rowsBig.toDouble / math.max(1L, rowsSmall) >
        maxGrowthFactor * inputRatio

  final case class AppRun(name: String, inputRows: Long, wallSec: Double,
    batches: Long, meanBatchMs: Double, maxBatchMs: Long, stateRows: Long,
    stateBytes: Long, freshnessMaxDelay: Option[Long])

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Cut a source into one file per micro-batch along its event-time
    * order (the ordered replay a per-partition-ordered topic
    * delivers), mtimes increasing so the file source consumes them in
    * shard order. The first shard keeps the bare `<name>.parquet` the
    * apps' schema probes read. */
  private def shard(df: DataFrame, order: Column, dir: String,
      name: String): Unit = {
    // bench PREP, not measured work: the global ntile sort is fine at
    // replay scale (≤1M rows at sf0.1); a bigger replay would
    // repartitionByRange
    val withB = df.withColumn("__b", ntile(shards).over(Window.orderBy(order)))
    (1 to shards).foreach { i =>
      val f =
        if (i == 1) s"$dir/$name.parquet" else s"$dir/${name}_$i.parquet"
      withB.filter(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("overwrite").parquet(f)
      val d = new java.io.File(f)
      (d +: Option(d.listFiles()).getOrElse(Array.empty).toSeq)
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
      ()
    }
  }

  /** Stage all replay inputs for one scale into a fresh source dir. */
  private def prepare(s: SparkSession, sfDir: String): String = {
    val src = tmp("streambench_src")
    shard(DimApp.envelopes(s, sfDir).unionByName(BaseDbApp.envelopes(s, sfDir)),
      get_json_object(col("envelope"), "$.ts").cast("long"),
      src, "envelopes")
    shard(BaseLogApp.logLines(s, sfDir),
      get_json_object(col("raw"), "$.ts").cast("long"), src, "logs")
    shard(s.read.parquet(s"$sfDir/events.parquet"), col("ts"),
      src, "events")
    shard(s.read.parquet(s"$sfDir/orders.parquet"), col("o_orderdate"),
      src, "orders")
    shard(s.read.parquet(s"$sfDir/lineitem.parquet"), col("l_shipdate"),
      src, "lineitem")
    // dim tables the province app reads from ITS source dir
    Seq("customer", "nation").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"),
        java.nio.file.Paths.get(s"$src/$t.parquet"))
      ()
    }
    src
  }

  /** Run one app to completion and fold its progress stream. */
  private def measure(name: String, start: () => StreamingQuery)
      : AppRun = {
    val t0 = System.nanoTime()
    val sq = start()
    try sq.processAllAvailable() finally sq.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val ps = sq.recentProgress.toSeq
    val worked = ps.filter(p => p.numInputRows > 0 ||
      Option(p.stateOperators).exists(_.exists(_.numRowsUpdated > 0)))
    val durs = worked.flatMap(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toLong))
    val lastState = ps.reverse
      .find(p => Option(p.stateOperators).exists(_.nonEmpty))
      .map(_.stateOperators.toSeq).getOrElse(Seq.empty)
    AppRun(name,
      inputRows = ps.map(_.numInputRows).sum,
      wallSec = wall,
      batches = worked.size.toLong,
      meanBatchMs =
        if (durs.isEmpty) 0.0 else durs.sum.toDouble / durs.size,
      maxBatchMs = if (durs.isEmpty) 0L else durs.max,
      stateRows = lastState.map(_.numRowsTotal).sum,
      stateBytes = lastState.map(_.memoryUsedBytes).sum,
      freshnessMaxDelay = None)
  }

  /** Run a windowed app through foreachBatch, recording each emitted
    * window's end next to the engine's per-batch watermark, and fold
    * the StreamingSpec freshness metric: for every emitted window, how
    * many batches AFTER the first watermark-eligible one did it take
    * to surface (0 = the serving-freshness contract holds). */
  private def measureWindowed(name: String, df: DataFrame): AppRun = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var sqRef: StreamingQuery = null
    val run = measure(name, () => {
      val sq = df.writeStream
        .option("checkpointLocation", tmp(s"sb_ckp_$name"))
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          // bench instrumentation, not pipeline code: a micro-batch
          // emits a handful of closed windows; collecting their edt
          // strings is the freshness probe, like the publisher
          // rendering an aggregated serving row
          batch.select(col("edt")).collect().foreach { r =>
            val end = java.time.LocalDateTime
              .parse(r.getString(0), fmt)
              .toEpochSecond(java.time.ZoneOffset.UTC)
            emitted.synchronized { emitted += ((id, end)); () }
          }
          ()
        }
        .start()
      sqRef = sq
      sq
    })
    val wm = sqRef.recentProgress.toSeq
      .map(p => p.batchId -> Option(p.eventTime.get("watermark"))
        .map(w => java.time.Instant.parse(w).getEpochSecond)
        .getOrElse(0L))
      .toMap
    val delays = emitted.synchronized { emitted.toSeq }.map {
      case (bid, end) =>
        val eligible = wm.toSeq.filter(_._2 >= end).map(_._1)
        // ADVICE round-9: an emitted window with NO watermark-eligible
        // batch means the progress stream never recorded (or failed to
        // parse) a watermark covering it — fail CLOSED with a -1
        // sentinel instead of folding the missing evidence into
        // "perfectly fresh" (StreamBenchSpec rejects -1)
        if (eligible.isEmpty) -1L else bid - eligible.min
    }
    run.copy(freshnessMaxDelay = Some(
      if (delays.isEmpty) 0L
      else if (delays.contains(-1L)) -1L
      else delays.max))
  }

  /** The full 12-app topology of ConcurrentAppsSpec, run sequentially
    * for clean per-app numbers (the spec proves concurrency; the bench
    * measures each app's own cost). */
  private def runAll(s: SparkSession, sfDir: String): Seq[AppRun] = {
    val src = prepare(s, sfDir)
    def noop(df: DataFrame, name: String): () => StreamingQuery =
      () => df.writeStream
        .option("checkpointLocation", tmp(s"sb_ckp_$name"))
        .outputMode("append").format("noop").start()
    Seq(
      measure("dim", () =>
        DimApp.run(s, src, tmp("sb_dim"), tmp("sb_ck_dim"))),
      measure("basedb", () =>
        BaseDbApp.run(s, src, tmp("sb_db"), tmp("sb_ck_db"))),
      measure("baselog", () =>
        BaseLogApp.run(s, src, tmp("sb_log"), tmp("sb_ck_log"))),
      measure("province_order", () =>
        ProvinceOrderApp.run(s, src, tmp("sb_prov"), tmp("sb_ck_prov"))),
      measure("keyword", () =>
        KeywordApp.run(s, src, tmp("sb_kw"), tmp("sb_ck_kw"))),
      measure("sku_order", () =>
        SkuOrderApp.run(s, src, sfDir, tmp("sb_sku"), tmp("sb_ck_sku"))),
      measureWindowed("traffic_channel",
        StatefulStreams.windowedCounts(s, src)),
      measureWindowed("user_login",
        UserLoginApp.windowSums(UserLoginApp.flagStream(
          UserLoginApp.logins(StatefulStreams.eventStream(s, src))).toDF())),
      measureWindowed("cart_add",
        CartAddUuApp.windowCounts(CartAddUuApp.uuStream(
          CartAddUuApp.cartAdds(StatefulStreams.eventStream(s, src))).toDF())),
      measureWindowed("home_detail",
        HomeDetailApp.windowSums(HomeDetailApp.flagStream(
          HomeDetailApp.pageViews(StatefulStreams.eventStream(s, src))).toDF())),
      measureWindowed("page_view",
        TrafficPageViewApp.windowSums(TrafficPageViewApp.measureStream(
          TrafficPageViewApp.pageViews(
            StatefulStreams.eventStream(s, src))).toDF())),
      measure("daily_first",
        noop(StatefulStreams.dailyFirstStream(s, src).toDF(),
          "daily_first")))
  }

  /** One CONCURRENT pass — all 12 apps live at once over freshly
    * staged inputs (the reference's actual operating mode,
    * BaseApp.java's always-on fleet; ConcurrentAppsSpec proves store
    * isolation, this measures the schedule): returns the topology
    * wall-clock and total input rows consumed. Compared against the
    * sequential walls it answers "do 12 apps pipeline on one cluster,
    * or serialize?" — the contention number per-app rows/sec cannot
    * see. */
  private def runTopology(s: SparkSession, sfDir: String): (Double, Long) = {
    val src = prepare(s, sfDir)
    def noop(df: DataFrame, name: String): StreamingQuery =
      df.writeStream.option("checkpointLocation", tmp(s"sbt_ckp_$name"))
        .outputMode("append").format("noop").start()
    val t0 = System.nanoTime()
    val queries = Seq(
      DimApp.run(s, src, tmp("sbt_dim"), tmp("sbt_ck1")),
      BaseDbApp.run(s, src, tmp("sbt_db"), tmp("sbt_ck2")),
      BaseLogApp.run(s, src, tmp("sbt_log"), tmp("sbt_ck3")),
      ProvinceOrderApp.run(s, src, tmp("sbt_prov"), tmp("sbt_ck4")),
      KeywordApp.run(s, src, tmp("sbt_kw"), tmp("sbt_ck5")),
      SkuOrderApp.run(s, src, sfDir, tmp("sbt_sku"), tmp("sbt_ck6")),
      noop(StatefulStreams.windowedCounts(s, src), "channel"),
      noop(UserLoginApp.windowSums(UserLoginApp.flagStream(
        UserLoginApp.logins(StatefulStreams.eventStream(s, src))).toDF()),
        "user_login"),
      noop(CartAddUuApp.windowCounts(CartAddUuApp.uuStream(
        CartAddUuApp.cartAdds(StatefulStreams.eventStream(s, src))).toDF()),
        "cart_add"),
      noop(HomeDetailApp.windowSums(HomeDetailApp.flagStream(
        HomeDetailApp.pageViews(StatefulStreams.eventStream(s, src))).toDF()),
        "home_detail"),
      noop(TrafficPageViewApp.windowSums(TrafficPageViewApp.measureStream(
        TrafficPageViewApp.pageViews(
          StatefulStreams.eventStream(s, src))).toDF()), "page_view"),
      noop(StatefulStreams.dailyFirstStream(s, src).toDF(), "daily_first"))
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = queries.flatMap(_.recentProgress).map(_.numInputRows).sum
    (wall, rows)
  }

  private def fmt(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)

  private def appJson(r: AppRun): String = {
    val fresh = r.freshnessMaxDelay.map(_.toString).getOrElse("null")
    s""""${r.name}":{"input_rows":${r.inputRows},""" +
      s""""wall_sec":${fmt(r.wallSec)},""" +
      s""""rows_per_sec":${fmt(r.inputRows / math.max(1e-9, r.wallSec))},""" +
      s""""batches":${r.batches},"mean_batch_ms":${fmt(r.meanBatchMs)},""" +
      s""""max_batch_ms":${r.maxBatchMs},"state_rows":${r.stateRows},""" +
      s""""state_bytes":${r.stateBytes},"freshness_max_delay":$fresh}"""
  }

  def main(args: Array[String]): Unit = {
    // default step sf0.01 → sf0.1: the SAME 10× step the batch ledgers
    // (SCALE_LEDGER) measure, so the state-growth claims carry the
    // same evidence scale as the shuffle-growth claims
    val big = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL",
      "/root/testdata/sf0.01")
    val outJson = args.headOption.getOrElse("STREAM_BENCH.json")
    val outLedger = args.lift(1).getOrElse("STATE_LEDGER.tsv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Verify.session(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // one shard file per micro-batch, for every app's file source
    spark.conf.set("graft.stream.maxFilesPerTrigger", "1")

    val smallRuns = runAll(spark, small)
    val bigRuns = runAll(spark, big)
    // the PRODUCTION state backend: at 100 TB the stateful fleet runs
    // on RocksDB (state no longer bounded by executor heap), so its
    // throughput/state profile is the number that matters — same big
    // scale, same apps, fresh checkpoints, provider switched for the
    // whole pass (W7's spec proves result identity; this measures it)
    val rocksRuns = {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      try runAll(spark, big)
      finally spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }

    val ledger = bigRuns.map { b =>
      val sm = smallRuns.find(_.name == b.name).get
      val rk = rocksRuns.find(_.name == b.name).get
      val growth = b.stateRows.toDouble / math.max(1L, sm.stateRows)
      "%s\t%d\t%d\t%d\t%d\t%d\t%d\t%.3f\t%s".formatLocal(Locale.ROOT,
        b.name, sm.stateRows, b.stateRows, sm.stateBytes, b.stateBytes,
        rk.stateRows, rk.stateBytes, growth,
        if (flaggedState(sm.stateRows, b.stateRows)) "FLAG" else "ok")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outLedger),
      "# app\tstate_rows_small\tstate_rows_big\tstate_bytes_small" +
        "\tstate_bytes_big\trocks_rows_big\trocks_bytes_big" +
        "\tgrowth\tverdict - generated by " +
        "graft.StreamBench; enforced by StreamBenchSpec (flag = state " +
        s"rows grew >${maxGrowthFactor}x the ${inputRatio.toInt}x " +
        s"input step above the $stateRowFloor-row floor; rocks_* = " +
        "the same big-scale run under RocksDBStateStoreProvider — " +
        "row identity asserted by the spec; scales: " +
        s"$small vs $big)\n" + ledger.mkString("", "\n", "\n"))

    val (topoWall, topoRows) = runTopology(spark, big)
    val seqWall = bigRuns.map(_.wallSec).sum
    val json = s"""{"sf":"$big","shards":$shards,""" +
      s""""topology":{"apps":12,"wall_sec":${fmt(topoWall)},""" +
      s""""input_rows":$topoRows,""" +
      s""""rows_per_sec":${fmt(topoRows / math.max(1e-9, topoWall))},""" +
      s""""sequential_wall_sec":${fmt(seqWall)}},""" +
      s""""apps":{""" + bigRuns.map(appJson).mkString(",") + "}," +
      s""""apps_rocksdb":{""" + rocksRuns.map(appJson).mkString(",") + "}}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json + "\n")
    spark.stop()
    println(json)
  }
}
