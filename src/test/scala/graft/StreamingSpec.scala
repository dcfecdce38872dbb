package graft

import org.apache.spark.sql.functions._
import graft.streaming.StatefulStreams

/** Streaming-vs-batch agreement (SURVEY.md §7.5 risk 3): the Structured
  * Streaming rebuilds must produce the same results as their batch twins
  * when driven over the same bounded input (memory sink +
  * processAllAvailable = synchronous micro-batch execution). */
class StreamingSpec extends SparkSuite {

  private def runStream[T](df: org.apache.spark.sql.Dataset[T],
      name: String, mode: String): org.apache.spark.sql.DataFrame = {
    val sq = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    sq.processAllAvailable()
    sq.stop()
    spark.table(name)
  }

  test("windowed counts: stream == batch groupBy window") {
    val streamed = runStream(
      StatefulStreams.windowedCounts(spark, sf), "win_counts", "append")
    // batch twin via the same window() builtin
    val e = Tables(spark, sf, "events")
    val batch = e
      .withColumn("et", timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts"))))
      .groupBy(window(col("et"), "10 seconds"), col("event_type"))
      .agg(count(lit(1)).as("pv_ct"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("pv_ct"))
    // append mode only emits CLOSED windows: watermark = max(et) - 3 s,
    // so windows whose end is beyond it are (correctly) withheld
    val wm = e.agg(max(timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts")))) - expr("INTERVAL 3 SECONDS"))
      .head.getTimestamp(0)
    val closed = batch.filter(
      to_timestamp(col("edt"), "yyyy-MM-dd HH:mm:ss") <= lit(wm))
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0)
    assert(batch.exceptAll(streamed).count() <= 2) // ≤ the open tail windows
  }

  test("daily-first state: stream emits exactly the batch rn=1 user-days") {
    val streamed = runStream(
      StatefulStreams.dailyFirstStream(spark, sf), "daily_first", "append")
      .select(col("user_id"), col("cur_date"))
    val batch = Tables(spark, sf, "events").select(col("user_id"),
        graft.functions.Fns.curDate(graft.functions.Fns.nsToSec(col("ts")))
          .as("cur_date"))
      .distinct()
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("daily-first state is provider-independent (RocksDB == default)") {
    // at 100 TB keyed state outgrows executor heaps; RocksDB is the
    // production provider. Same query, same results, state off-heap.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val streamed = runStream(
        StatefulStreams.dailyFirstStream(spark, sf), "daily_first_rdb",
        "append").select(col("user_id"), col("cur_date"))
      val batch = Tables(spark, sf, "events").select(col("user_id"),
          graft.functions.Fns.curDate(graft.functions.Fns.nsToSec(col("ts")))
            .as("cur_date"))
        .distinct()
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming session windows: closed sessions equal the batch merge") {
    val streamed = runStream(
      StatefulStreams.sessionCounts(spark, sf), "session_counts", "append")
    val e = Tables(spark, sf, "events")
    val batch = e
      .withColumn("et", timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts"))))
      .groupBy(session_window(col("et"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("event_ct"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("user_id"), col("event_ct"))
    // append emits only sessions CLOSED by the final watermark
    val wm = e.agg(max(timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts")))) - expr("INTERVAL 3 SECONDS"))
      .head.getTimestamp(0)
    val closed = batch.filter(
      to_timestamp(col("session_end"), "yyyy-MM-dd HH:mm:ss") <= lit(wm))
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0)
    // nothing beyond the open tail is missing
    assert(batch.exceptAll(streamed).count() <=
      batch.filter(to_timestamp(col("session_end"),
        "yyyy-MM-dd HH:mm:ss") > lit(wm)).count())
  }

  test("streaming as-of keyed state matches the batch window as-of (j10)") {
    val streamed = runStream(
      StatefulStreams.asofAttributionStream(spark, sf), "asof_stream",
      "append")
      .select(col("p_event_id"), col("user_id"), col("p_us"),
        col("v_us"), col("gap_us"))
    val batch = q("j10_asof_attribution")
      .select(col("p_event_id"), col("user_id"), col("p_us"),
        col("v_us"), col("gap_us"))
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join matches the batch range join") {
    val streamed = runStream(
      StatefulStreams.intervalJoinStream(spark, sf), "sj_pairs", "append")
    // batch twin at the same (second) time resolution
    val e = Tables(spark, sf, "events")
      .withColumn("sec", graft.functions.Fns.nsToSec(col("ts")))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("sec").as("p_sec"),
        col("event_id").as("p_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("sec").as("c_sec"),
        col("event_id").as("c_id"))
    val batch = p.join(c, col("p_user") === col("c_user") &&
        col("c_sec") >= col("p_sec") - 1800 &&
        col("c_sec") <= col("p_sec") + 5)
      .select(col("p_user").as("user_id"), col("p_id"), col("c_id"))
    // bounded input + final watermark: a tail of pairs near max event time
    // may be withheld; everything emitted must be correct and near-complete
    assert(streamed.exceptAll(batch).count() == 0,
      "stream emitted a pair the batch join does not contain")
    val missing = batch.exceptAll(streamed).count()
    assert(missing <= 2, s"stream withheld $missing pairs (expected ≤ tail)")
  }

  test("stream-static enrich joins every routed event (J4 semantics)") {
    val streamed = runStream(
      StatefulStreams.streamStaticEnrich(spark, sf), "enrich", "append")
    val total = Tables(spark, sf, "events").count()
    assert(streamed.count() == total) // config covers all 5 types
    assert(streamed.filter(col("sink_table").isNull).count() == 0)
  }

  test("stream-stream left outer join null-extends unmatched purchases once") {
    val streamed = runStream(
      StatefulStreams.leftOuterJoinStream(spark, sf), "loj_pairs", "append")
    // every emitted purchase id appears with either matches or ONE null row
    val perPurchase = streamed.groupBy("p_id")
      .agg(count(lit(1)).as("rows"),
        sum(when(col("c_id").isNull, 1L).otherwise(0L)).as("nulls"))
    assert(perPurchase.filter(col("nulls") > 0 && col("rows") > col("nulls"))
      .count() == 0, "a purchase has both null-extended and matched rows")
    assert(perPurchase.filter(col("nulls") > 1).count() == 0,
      "null row emitted more than once (retraction-style duplicate)")
    // matched pairs agree with the inner stream-stream join
    val inner = runStream(
      StatefulStreams.intervalJoinStream(spark, sf), "inner_pairs", "append")
    val matched = streamed.filter(col("c_id").isNotNull)
    assert(matched.exceptAll(inner).count() == 0,
      "left-outer emitted a matched pair the inner join does not have")
  }

  test("W4 processing-time window conserves every row (structural)") {
    val streamed = runStream(
      StatefulStreams.processingTimeCounts(spark, sf), "pt_win", "update")
    // update mode may emit a key several times (counts only grow) —
    // the latest value per (window, type) is the max
    val total = streamed.groupBy(col("wstart"), col("event_type"))
      .agg(max(col("pv_ct")).as("pv_ct"))
      .agg(sum(col("pv_ct"))).head.getLong(0)
    assert(total == Tables(spark, sf, "events").count(),
      "processing-time windows must conserve the input rows")
  }

  test("histogram sketch aggregates identically in a streaming window") {
    // same mergeability contract as CMS/HLL: elementwise-sum bins make
    // the packed histogram BIT-equal between the incremental and batch
    // paths on closed windows — the streaming percentile monitor
    val hist = udaf(new graft.functions.HistogramSketch)
    def agged(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("et", timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts"))))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 minutes"))
      .agg(hist(col("value") * 1000.0).as("sketch"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("stt"), col("window.end").as("edt"), col("sketch"))
    val streamed = runStream(
      agged(StatefulStreams.eventStream(spark, sf)), "hist_win", "append")
    val e = Tables(spark, sf, "events")
    val wm = e.agg(max(timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts")))) -
      expr("INTERVAL 3 SECONDS")).head.getTimestamp(0)
    val closed = agged(e).filter(col("edt") <= lit(wm))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0)
  }

  test("CMS sketch aggregates identically in a streaming window") {
    // elementwise-sum merge is associative+commutative, so the packed
    // counter matrix is BIT-equal between the incremental (state-store)
    // and batch paths on closed windows — same contract as HLL below
    val cms = udaf(new graft.functions.CmsSketch)
    def agged(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("et", timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts"))))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 minutes"))
      .agg(cms(col("event_type")).as("sketch"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("stt"), col("window.end").as("edt"), col("sketch"))
    val streamed = runStream(
      agged(StatefulStreams.eventStream(spark, sf)), "cms_win", "append")
    val e = Tables(spark, sf, "events")
    val wm = e.agg(max(timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts")))) -
      expr("INTERVAL 3 SECONDS")).head.getTimestamp(0)
    val closed = agged(e).filter(col("edt") <= lit(wm))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0)
  }

  test("HLL sketch aggregates identically in a streaming window") {
    val hll = udaf(graft.functions.HllSketch)
    def agged(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("et", timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts"))))
      .withWatermark("et", "3 seconds")
      .groupBy(window(col("et"), "10 minutes"))
      .agg(hll(col("user_id")).as("uv"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("stt"), col("window.end").as("edt"), col("uv"))
    val streamed = runStream(
      agged(StatefulStreams.eventStream(spark, sf)), "hll_win", "append")
    val e = Tables(spark, sf, "events")
    val wm = e.agg(max(timestamp_seconds(
        graft.functions.Fns.nsToSec(col("ts")))) -
      expr("INTERVAL 3 SECONDS")).head.getTimestamp(0)
    val closed = agged(e).filter(col("edt") <= lit(wm))
    assert(streamed.count() > 0)
    // register-max merge is deterministic: closed-window estimates are
    // BIT-equal between the incremental (state-store) and batch paths
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0)
  }

  test("kafka-wire seam: KeywordApp output identical to file-stream path") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables(spark, sf, "events")
    // serialize every event through the SINK adapter, then feed the
    // resulting (key BINARY, value BINARY) wire rows — exactly the
    // format("kafka") schema — through the SOURCE adapter
    val wire = graft.streaming.KafkaSeam.toKafka(events, col("event_id"))
      .as[(Array[Byte], Array[Byte])].collect()
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Array[Byte], Array[Byte])]
    source.addData(wire.toSeq)
    val kafkaShaped = source.toDF().toDF("key", "value")
    val viaKafka = runStream(graft.streaming.KeywordApp.transform(spark,
      graft.streaming.KafkaSeam.fromKafka(kafkaShaped, events.schema)),
      "kw_kafka", "append")
    val viaFile = runStream(graft.streaming.KeywordApp.transform(spark,
      StatefulStreams.eventStream(spark, sf)), "kw_file", "append")
    assert(viaKafka.count() > 0)
    assert(viaKafka.exceptAll(viaFile).count() == 0 &&
      viaFile.exceptAll(viaKafka).count() == 0,
      "kafka-shaped source path != file-stream path")
  }

  test("kafka-wire seam: BaseDbApp routes identically off the CDC wire format") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val app = graft.streaming.BaseDbApp
    val envs = app.envelopes(spark, sf)
    // CDC wire: value bytes ARE the Maxwell envelope (no re-wrapping),
    // key = the source row's PK — the exact byte layout a broker-backed
    // deployment consumes (BaseSQLApp.java:55-68 fidelity)
    val wire = graft.streaming.KafkaSeam.envelopeToKafka(envs,
        get_json_object(col("envelope"), "$.data.id"))
      .as[(Array[Byte], Array[Byte])].collect()
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Array[Byte], Array[Byte])]
    source.addData(wire.toSeq)
    val kafkaShaped = source.toDF().toDF("key", "value")
    // MapType doesn't support set ops — compare on sorted entry lists
    def comparable(df: org.apache.spark.sql.DataFrame) =
      df.select(col("sink_table"),
        array_sort(map_entries(col("data"))).as("data_kv"))
    val viaKafka = comparable(runStream(app.routed(spark,
      graft.streaming.KafkaSeam.envelopeFromKafka(kafkaShaped)),
      "basedb_kafka", "append"))
    val direct = comparable(app.routed(spark, envs))
    assert(viaKafka.count() > 0)
    assert(viaKafka.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaKafka).count() == 0,
      "kafka-wire route store != direct path")
  }

  test("kafka-wire seam: DimApp parses identically off the CDC wire format") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val app = graft.streaming.DimApp
    val envs = app.envelopes(spark, sf)
    val wire = graft.streaming.KafkaSeam.envelopeToKafka(envs,
        get_json_object(col("envelope"), "$.data.id"))
      .as[(Array[Byte], Array[Byte])].collect()
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Array[Byte], Array[Byte])]
    source.addData(wire.toSeq)
    val kafkaShaped = source.toDF().toDF("key", "value")
    def comparable(df: org.apache.spark.sql.DataFrame) =
      df.select(col("sink_table"), col("id"), col("op"), col("seq"),
        array_sort(map_entries(col("data"))).as("data_kv"))
    val viaKafka = comparable(runStream(app.parsedDims(spark,
      graft.streaming.KafkaSeam.envelopeFromKafka(kafkaShaped)),
      "dim_kafka", "append"))
    val direct = comparable(app.parsedDims(spark, envs))
    assert(viaKafka.count() > 0)
    assert(viaKafka.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaKafka).count() == 0,
      "kafka-wire dim rows != direct path")
  }

  test("daily-first state survives across micro-batches (MemoryStream)") {
    import spark.implicits._
    import graft.streaming.StatefulStreams.{DailyFirst, UserEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400L
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UserEvent]
    val out = source.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        graft.streaming.StatefulStreams.trackDailyFirst _)
    val sq = out.writeStream.outputMode("append").format("memory")
      .queryName("xbatch").start()
    // batch 1: user 1 active on day0 (twice) and day1
    source.addData(UserEvent(1L, 10L, 1L, "view", 1.0),
      UserEvent(1L, 20L, 2L, "view", 1.0),
      UserEvent(1L, day + 5L, 3L, "view", 1.0))
    sq.processAllAvailable()
    // batch 2: day1 again (must NOT re-emit) + day2 (must emit)
    source.addData(UserEvent(1L, day + 50L, 4L, "view", 1.0),
      UserEvent(1L, 2 * day + 1L, 5L, "view", 1.0))
    sq.processAllAvailable()
    sq.stop()
    val got = spark.table("xbatch").as[DailyFirst].collect()
      .map(_.cur_date).sorted.toSeq
    assert(got == Seq("1970-01-01", "1970-01-02", "1970-01-03"),
      s"cross-batch dedup broken: $got")
  }

  test("is_new fix applies the reference's four state rules across batches") {
    import spark.implicits._
    import graft.streaming.StatefulStreams.{FixedEvent, TaggedEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400L
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TaggedEvent]
    val sq = StatefulStreams.isNewFixStream(source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("isnew_fix").start()
    // batch 1: A claims new on day0 twice (keep 1,1); B claims old with
    // no state (backfill yesterday, emit 0)
    source.addData(
      TaggedEvent(1L, 10L, 1L, 1), TaggedEvent(1L, 20L, 2L, 1),
      TaggedEvent(2L, 5 * day + 10L, 3L, 0))
    sq.processAllAvailable()
    // batch 2: A claims new on day1 (→0, state says day0); B claims new
    // on day6 (→0, state backfilled day4)
    source.addData(
      TaggedEvent(1L, day + 30L, 4L, 1), TaggedEvent(2L, 6 * day + 1L, 5L, 1))
    sq.processAllAvailable(); sq.stop()
    val got = spark.table("isnew_fix").as[FixedEvent].collect()
      .map(f => f.event_id -> f.is_new).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 0, 5L -> 0),
      s"rule application wrong: $got")
  }

  test("engine-native streaming dedup covers exactly the batch key set") {
    // dropDuplicatesWithinWatermark: engine-evicted bounded dedup
    // state. The single-file source arrives as one micro-batch, so no
    // state eviction can occur mid-input and the surviving key set must
    // equal the batch distinct exactly (which duplicate ROW survives is
    // arrival order, like the reference's first-wins ValueState — the
    // value-deterministic twin is a7_dedup_last)
    val streamed = runStream(
      graft.streaming.StatefulStreams.dedupWithinWatermark(spark, sf),
      "dedup_wm", "append").select(col("user_id"), col("event_type"))
    val batch = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct()
    assert(streamed.count() == streamed.distinct().count(),
      "dedup emitted a duplicate key")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("Trigger.AvailableNow catch-up run equals the continuous result") {
    // the cost-efficient production mode for periodic catch-up over a
    // growing source: process everything available, then terminate —
    // results must be identical to the always-on run over the same
    // bounded input
    val sq = StatefulStreams.windowedCounts(spark, sf).writeStream
      .outputMode("append").format("memory").queryName("win_avnow")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(sq.awaitTermination(120000), "AvailableNow did not terminate")
    val avnow = spark.table("win_avnow")
    val cont = runStream(
      StatefulStreams.windowedCounts(spark, sf), "win_cont", "append")
    assert(avnow.exceptAll(cont).count() == 0 &&
      cont.exceptAll(avnow).count() == 0)
  }

  test("watermark drop is counted by the engine's own state metrics") {
    // W6 via the engine's ledger, not output inspection: a row older
    // than the advanced watermark must be dropped AND counted in
    // numRowsDroppedByWatermark (what a 100 TB pipeline alerts on —
    // the w6_late_audit batch query is the replayable twin)
    import spark.implicits._
    import graft.streaming.StatefulStreams.UserEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UserEvent]
    val counts = source.toDF()
      .withColumn("et", timestamp_seconds(col("sec")))
      .withWatermark("et", "0 seconds")
      .groupBy(window(col("et"), "10 seconds"))
      .agg(count(lit(1)).as("ct"))
    val sq = counts.writeStream.outputMode("append").format("memory")
      .queryName("wm_drop").start()
    source.addData(UserEvent(1L, 100L, 1L, "view", 1.0),
      UserEvent(2L, 205L, 2L, "view", 1.0)) // watermark → 205
    sq.processAllAvailable()
    source.addData(UserEvent(3L, 101L, 3L, "view", 1.0)) // late: < 205
    sq.processAllAvailable()
    sq.stop()
    val dropped = sq.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped >= 1L, s"late row not counted as dropped: $dropped")
    // and the dropped row never surfaced: only the closed first window
    val rows = spark.table("wm_drop").collect()
    assert(rows.forall(_.getLong(1) == 1L),
      s"late row leaked into a window: ${rows.mkString(",")}")
  }

  test("state size is keyspace-bounded and watermark-evicted") {
    // the 100 TB sizing guard: per-app state must scale with LIVE keys,
    // not with rows seen. Three contracts, each read off the engine's
    // own state metrics so a key-space leak (a lost watermark, a state
    // row per EVENT instead of per entity) fails here at test time.
    import spark.implicits._
    import graft.streaming.StatefulStreams.UserEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // (1) UV/login family: one GroupState row per DISTINCT user, ever —
    // never per event
    val sq1 = StatefulStreams.dailyFirstStream(spark, sf).writeStream
      .outputMode("append").format("memory").queryName("state_uv").start()
    sq1.processAllAvailable()
    sq1.stop()
    val uvState = sq1.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsTotal)).max
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(uvState == users,
      s"daily-first state rows $uvState != distinct users $users")

    // (2) dedup: dropDuplicatesWithinWatermark EVICTS keys the
    // watermark has passed — state after the horizon moves is the
    // recent keys only, not everything ever seen
    val src =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UserEvent]
    val dedup = src.toDF()
      .withColumn("et", timestamp_seconds(col("sec")))
      .withWatermark("et", "10 seconds")
      .dropDuplicatesWithinWatermark("user_id")
    val sq2 = dedup.writeStream.outputMode("append").format("memory")
      .queryName("state_dedup").start()
    src.addData((1 to 50).map(i => UserEvent(i.toLong, 100L, i.toLong,
      "view", 1.0)): _*)
    sq2.processAllAvailable() // 50 keys in state, watermark -> 90
    val afterLoad = sq2.lastProgress.stateOperators.map(_.numRowsTotal).sum
    src.addData(UserEvent(1000L, 100000L, 1000L, "view", 1.0))
    sq2.processAllAvailable() // watermark -> 99990 at NEXT batch
    src.addData(UserEvent(1001L, 100001L, 1001L, "view", 1.0))
    sq2.processAllAvailable() // batch runs with wm 99990: evicts the 50
    sq2.stop()
    val afterHorizon = sq2.lastProgress.stateOperators
      .map(_.numRowsTotal).sum
    assert(afterLoad >= 50L, s"dedup state never materialized: $afterLoad")
    assert(afterHorizon <= 2L,
      s"dedup state not evicted past the watermark: $afterHorizon rows " +
        s"(a dropDuplicates WITHOUT the watermark bound leaks exactly " +
        s"like this)")

    // (3) stream-stream interval join: state bounded by the time range,
    // evicted as the watermark advances past [-30 min, +5 s]
    val ps =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UserEvent]
    val cs =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UserEvent]
    val p = ps.toDF().withColumn("p_et", timestamp_seconds(col("sec")))
      .select(col("user_id").as("p_user"), col("p_et"),
        col("event_id").as("p_id"))
      .withWatermark("p_et", "3 seconds")
    val c = cs.toDF().withColumn("c_et", timestamp_seconds(col("sec")))
      .select(col("user_id").as("c_user"), col("c_et"),
        col("event_id").as("c_id"))
      .withWatermark("c_et", "3 seconds")
    val joined = p.join(c, col("p_user") === col("c_user") &&
      col("c_et") >= col("p_et") - expr("INTERVAL 30 MINUTES") &&
      col("c_et") <= col("p_et") + expr("INTERVAL 5 SECONDS"))
    val sq3 = joined.writeStream.outputMode("append").format("memory")
      .queryName("state_join").start()
    ps.addData((1 to 30).map(i => UserEvent(i.toLong, 1000L, i.toLong,
      "purchase", 1.0)): _*)
    cs.addData((1 to 30).map(i => UserEvent(i.toLong, 1001L,
      100L + i, "click", 1.0)): _*)
    sq3.processAllAvailable()
    val joinLoaded = sq3.lastProgress.stateOperators
      .map(_.numRowsTotal).sum
    // jump both watermarks far past the interval, twice (cleanup uses
    // the PREVIOUS batch's watermark)
    ps.addData(UserEvent(9000L, 500000L, 9000L, "purchase", 1.0))
    cs.addData(UserEvent(9000L, 500000L, 9001L, "click", 1.0))
    sq3.processAllAvailable()
    ps.addData(UserEvent(9002L, 500010L, 9002L, "purchase", 1.0))
    cs.addData(UserEvent(9002L, 500010L, 9003L, "click", 1.0))
    sq3.processAllAvailable()
    sq3.stop()
    val joinAfter = sq3.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(joinLoaded >= 60L, s"join state never materialized: $joinLoaded")
    assert(joinAfter <= 8L,
      s"join state not evicted past the interval: $joinAfter rows " +
        s"(unbounded join state is W9's failure mode)")
  }

  test("last-seen state agrees with a7 batch dedup") {
    val streamed = runStream(
      StatefulStreams.lastSeenStream(spark, sf), "last_seen", "update")
    // one micro-batch ⇒ one output row per user; final state = batch answer
    val finalRows = streamed
      .select(col("user_id"), col("last_event_id"),
        col("last_event_type"), col("last_value"))
    val batch = q("a7_dedup_last")
    assert(finalRows.exceptAll(batch).count() == 0 &&
      batch.exceptAll(finalRows).count() == 0)
  }

  test("serving freshness: windowed rows reach the store in the FIRST " +
      "batch their watermark allows (two apps)") {
    // The reference's Doris DWS tables are queried seconds after window
    // close — end-to-end freshness = event time → row visible in the
    // serving store. In event time that contract is exact: a window
    // [s, e) must become visible in the first micro-batch whose
    // watermark reaches e (one batch later would be a sink lag the
    // wall-clock dashboards would see as staleness). Driven over a
    // controlled MemoryStream so batch boundaries are explicit; the
    // per-batch watermark comes from the engine's own progress events.
    import graft.streaming.{CartAddUuApp, UserLoginApp}
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    def edtSec(edt: String): Long =
      java.time.LocalDateTime.parse(edt, fmt)
        .toEpochSecond(java.time.ZoneOffset.UTC)

    def freshnessOf(app: String,
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Seq[Long] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Double)]
      val events = src.toDF()
        .toDF("user_id", "ts", "event_id", "event_type", "value")
      val emitted = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long)] // (batchId, window-end sec)
      val sq = mk(events).writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"fresh_$app").toString)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batch.select(col("edt")).collect()
            .foreach(r => emitted.synchronized {
              emitted += ((id, edtSec(r.getString(0))))
            })
          ()
        }
        .start()
      def feed(rows: (Long, Long, Long, String, Double)*): Unit = {
        src.addData(rows: _*)
        sq.processAllAvailable()
      }
      val ns = 1000000000L
      // batch A: two users inside window [0, 10)
      feed((1L, 2L * ns, 100L, "view", 1.0),
        (2L, 5L * ns, 101L, "click", 1.0),
        (1L, 6L * ns, 102L, "click", 1.0))
      // batch B: event at 15 s → watermark 12 ≥ 10 closes [0, 10)
      feed((3L, 15L * ns, 103L, "view", 1.0),
        (3L, 15L * ns, 104L, "click", 1.0))
      // batch C: event at 30 s → watermark 27 ≥ 20 closes [10, 20)
      feed((1L, 30L * ns, 105L, "view", 1.0),
        (1L, 30L * ns, 106L, "click", 1.0))
      // batch D: 45 s closes [30, 40)... keeps the tail observable
      feed((2L, 45L * ns, 107L, "view", 1.0),
        (2L, 45L * ns, 108L, "click", 1.0))
      // engine-reported watermark per batch, from the progress stream
      val wm = sq.recentProgress.toSeq
        .map(p => p.batchId -> Option(p.eventTime.get("watermark"))
          .map(w => java.time.Instant.parse(w).getEpochSecond)
          .getOrElse(0L))
        .toMap
      sq.stop()
      assert(emitted.nonEmpty, s"$app emitted nothing")
      // freshness per emitted window: how many batches AFTER the first
      // eligible one did the row take to surface? (0 = fresh)
      val delays = emitted.toSeq.map { case (bid, end) =>
        // append-mode correctness: the emitting batch's watermark
        // covers the window end
        assert(wm.getOrElse(bid, 0L) >= end,
          s"$app: window end $end emitted at batch $bid before its " +
            s"watermark ${wm.get(bid)}")
        val firstEligible = wm.toSeq.filter(_._2 >= end).map(_._1).min
        bid - firstEligible
      }
      // the freshness histogram the serving layer would publish
      val hist = delays.groupBy(identity).view.mapValues(_.size).toMap
      info(s"$app freshness histogram (delay-in-batches -> windows): " +
        hist.toSeq.sorted.mkString(", "))
      delays
    }

    val loginDelays = freshnessOf("user_login", events =>
      UserLoginApp.windowSums(
        UserLoginApp.flagStream(UserLoginApp.logins(events)).toDF()))
    val cartDelays = freshnessOf("cart_add", events =>
      CartAddUuApp.windowCounts(
        CartAddUuApp.uuStream(CartAddUuApp.cartAdds(events)).toDF()))
    // the bound: every window is served in its first eligible batch
    assert(loginDelays.forall(_ == 0),
      s"user_login windows served late: $loginDelays")
    assert(cartDelays.forall(_ == 0),
      s"cart_add windows served late: $cartDelays")
  }
}
