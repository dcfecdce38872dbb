package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}
import graft.functions.{Fns, Oracle}

/** DWS-layer windowed aggregations, rebuilt Spark-first.
  *
  * Reference operators covered (SURVEY.md §2.6 / §2.8):
  *  - A1 windowed count per keyword (DwsTrafficSourceKeywordPageViewWindow.java:55-63)
  *  - A2 incremental reduce + window finisher stamping stt/edt/cur_date
  *    (DwsTrafficVcChArIsNewPageViewWindow.java:148-172)
  *  - A3 BigDecimal sums (DwsTradeSkuOrderWindow.java:277-302)
  *  - A4 reduce + exact distinct order ids (DwsTradeProvinceOrderWindow.java:145-168)
  *  - A5 global (non-keyed) windowed reduce (DwsTrafficHomeDetailPageViewWindow.java:134-158)
  *  - W3 10 s tumbling event-time windows, epoch-aligned, left-closed
  *    (DwsTrafficVcChArIsNewPageViewWindow.java:138-145)
  *
  * Scale notes: every query below is a single hash-aggregate over a
  * parquet scan — one shuffle on the group keys, partial (map-side)
  * aggregation free from Catalyst. Window starts are computed with
  * integer math in the projection, so grouping stays inside whole-stage
  * codegen; amounts are summed as DECIMAL (exact, order-independent —
  * safe under any partitioning).
  */
object WindowAggs extends QueryModule {
  import Fns._

  /** A1/W3: 10 s tumble × keyword (the props."k" field plays the keyword
    * extracted by the reference's ik_analyze UDTF pipeline). */
  private def keywordWindowCount(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val w = windowStartSec(col("ts"), 10L)
    e.select(
        stt(w).as("stt"), edt(w, 10L).as("edt"),
        get_json_object(col("props"), "$.k").cast(LongType).as("keyword"))
      .groupBy("stt", "edt", "keyword")
      .agg(count(lit(1)).as("kw_ct"))
  }

  /** A2/A3: keyed 10 s window with several summed measures + finisher
    * stamping (pv/uv/dur analog of TrafficPageViewBean). Hourly window to
    * model the keyed-traffic rollup at a grain with real fan-in. */
  private def trafficWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val w = windowStartSec(col("ts"), 3600L)
    e.select(stt(w).as("stt"), edt(w, 3600L).as("edt"),
        curDate(w).as("cur_date"), col("event_type").as("ch"),
        col("user_id"), col("value"))
      .groupBy("stt", "edt", "cur_date", "ch")
      .agg(
        count(lit(1)).as("pv_ct"),
        countDistinct(col("user_id")).as("uv_ct"),
        moneySum(col("value")).as("dur_sum"))
  }

  /** A2 full bean shape: TrafficPageViewBean — 4 grouping dimensions
    * (vc, ch, ar, is_new) × 4 measures (pv/uv/sv/dur), hourly window
    * with the stt/edt/cur_date finisher
    * (DwsTrafficVcChArIsNewPageViewWindow.java:148-172). Dimensions are
    * synthesized deterministically from the event payload: vc = k mod 3,
    * ch = event_type, ar = user mod 5, is_new from the user's first day;
    * sv counts session-start events (k mod 7 = 0 plays last_page_id IS
    * NULL). */
  private def trafficBeanWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val w = windowStartSec(col("ts"), 3600L)
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val firstDay = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    e.select(stt(w).as("stt"), edt(w, 3600L).as("edt"),
        curDate(w).as("cur_date"),
        concat(lit("v"), pmod(k, lit(3L))).as("vc"),
        col("event_type").as("ch"),
        concat(lit("ar"), pmod(col("user_id"), lit(5L))).as("ar"),
        col("user_id"), col("value"),
        when(pmod(k, lit(7L)) === 0, 1L).otherwise(0L).as("is_start"),
        curDate(nsToSec(col("ts"))).as("event_day"))
      .withColumn("first_day", min(col("event_day")).over(firstDay))
      .withColumn("is_new",
        when(col("event_day") === col("first_day"), "1").otherwise("0"))
      .groupBy("stt", "edt", "cur_date", "vc", "ch", "ar", "is_new")
      .agg(count(lit(1)).as("pv_ct"),
        countDistinct(col("user_id")).as("uv_ct"),
        sum(col("is_start")).as("sv_ct"),
        moneySum(col("value")).as("dur_sum"))
  }

  /** A5: global (non-keyed) 10 s windowed reduce — Flink needed a
    * parallelism-1 windowAll barrier; Spark's partial aggregation keeps
    * this fully parallel. */
  private def globalWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val w = windowStartSec(col("ts"), 10L)
    e.select(stt(w).as("stt"), edt(w, 10L).as("edt"), col("user_id"),
        col("value"))
      .groupBy("stt", "edt")
      .agg(count(lit(1)).as("pv_ct"),
           countDistinct(col("user_id")).as("uv_ct"),
           moneySum(col("value")).as("value_sum"))
  }

  /** A4: province order window — per (day, nation): exact distinct order
    * count + DECIMAL amount (TradeProvinceOrderBean's Set<String> union ≈
    * countDistinct; the set-union accumulator is unnecessary under Spark's
    * partial-agg distinct). nation/region are bounded dims → broadcast;
    * customer scales with the fact side → shuffle hash/SMJ chosen by AQE.
    */
  private def provinceOrderWindow(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("cur_date"),
               col("n_name").as("province_name"))
      .agg(countDistinct(col("o_orderkey")).as("order_ct"),
           moneySum(col("o_totalprice")).as("order_amount"))
  }

  /** A3/P6: TPC-H-Q1-shaped pricing summary — DECIMAL arithmetic chain
    * (cast → multiply → sum) exactly as DwdTradeOrderDetail.java:40-41
    * computes split amounts; avg derived from exact sums. */
  private def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(money(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
            * (lit(1) + money(col("l_tax"))))
          .cast(DoubleType).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
  }

  /** W5+ (beyond reference — Flink app used none, SURVEY §2.8 W5):
    * sliding window 30 s / slide 10 s via the window() builtin — every
    * event lands in exactly 3 epoch-aligned windows. */
  private def slidingWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val et = timestamp_seconds(nsToSec(col("ts")))
    e.withColumn("et", et)
      .groupBy(window(col("et"), "30 seconds", "10 seconds"),
        col("event_type").as("ch"))
      .agg(count(lit(1)).as("pv_ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("ch"), col("pv_ct"))
  }

  /** W5+ session windows: 30-minute-gap sessions per user via
    * session_window() — the gap-islands computation as one builtin. */
  private def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val et = timestamp_seconds(nsToSec(col("ts")))
    e.withColumn("et", et)
      .groupBy(session_window(col("et"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("event_ct"),
        moneySum(col("value")).as("value_sum"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("event_ct"), col("value_sum"))
  }

  /** a23 (beyond-reference): ordered session-funnel conversion — the
    * product-analytics staple the reference's serving layer stops short
    * of. Sessions are 30-min inactivity islands per user (lag-gap flag +
    * running sum — ONE Exchange on user_id serves the ordering window,
    * the sessionization, and the three funnel stages); within a session
    * the funnel is strictly ordered: first view, first click AT-OR-AFTER
    * that view, first purchase at-or-after that click (each stage a
    * conditional min over the session partition, chained selects because
    * stage k's bound references stage k-1's window result). Microsecond
    * epoch math is integer-exact in both engines (`nsToUs` ↔
    * `epoch_us`, the j10 parity). At 100 TB: everything runs inside the
    * user_id partitioning; the final funnel rollup is a 1-row global
    * aggregate with a map-side partial. */
  private val sessGapUs = 30L * 60L * 1000000L

  /** The ONE 30-min-gap sessionization all of a23/a27/a29 build on:
    * events as (user_id, event_type, event_id, us, sess), session ids
    * from the classic lag-gap running sum under the (us, event_id)
    * total order. A change to the gap rule or tie-break lands in every
    * consumer at once — four diverging copies of this block is how
    * session boundaries silently desynchronize. */
  private def sessionized(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        nsToUs(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > sessGapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def sessionFunnel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = sessionized(s, dir)
    val wS = Window.partitionBy(col("user_id"), col("sess"))
    val staged = sess
      .withColumn("s1",
        min(when(col("event_type") === "view", col("us"))).over(wS))
      .withColumn("s2",
        min(when(col("event_type") === "click" && col("us") >= col("s1"),
          col("us"))).over(wS))
      .withColumn("s3",
        min(when(col("event_type") === "purchase" && col("us") >= col("s2"),
          col("us"))).over(wS))
    staged.groupBy(col("user_id"), col("sess"))
      .agg(max(col("s1")).as("v1"), max(col("s2")).as("v2"),
        max(col("s3")).as("v3"))
      .agg(count(lit(1)).as("sessions"),
        sum(when(col("v1").isNotNull, 1L).otherwise(0L)).as("viewed"),
        sum(when(col("v2").isNotNull, 1L).otherwise(0L))
          .as("clicked_after_view"),
        sum(when(col("v3").isNotNull, 1L).otherwise(0L))
          .as("purchased_after_click"))
  }

  /** a27 (beyond-reference): conversion-latency distribution — the
    * time-to-convert report on top of a23's sessionization: per
    * converted session (a view followed at-or-after by a purchase in
    * the same 30-min-gap session), latency = first qualifying purchase
    * − first view, summarized as rank-based p50/p95 (t7's integer pick
    * — rn = ceil(q·n), total order (latency, user, sess), no float
    * interpolation). Latencies are integer microseconds floored to
    * seconds (`divFloor` ↔ DuckDB `//`) — engine-exact end to end.
    * Scale: sessionization and stage mins all ride the user_id window
    * partitioning a23 already pays; only the CONVERTED sliver (a small
    * fraction of sessions) enters the global rank — and when even that
    * is too big, the a26 histogram sketch is the fixed-memory path. */
  private def conversionLatency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wS = Window.partitionBy(col("user_id"), col("sess"))
    val lat = sessionized(s, dir)
      .withColumn("v1",
        min(when(col("event_type") === "view", col("us"))).over(wS))
      .withColumn("p1",
        min(when(col("event_type") === "purchase" && col("us") >= col("v1"),
          col("us"))).over(wS))
      .groupBy(col("user_id"), col("sess"))
      .agg(max(col("v1")).as("v1"), max(col("p1")).as("p1"))
      .filter(col("v1").isNotNull && col("p1").isNotNull)
      .select(col("user_id"), col("sess"),
        (col("p1") - col("v1")).as("lat_us"))
    // exact global rank via [[globalRank]] (minute-of-latency buckets:
    // offsets come from a time-domain-bounded aggregate, not a
    // single-task sort of the converted-session frame)
    val ranked = globalRank(lat, expr("lat_us DIV 60000000"),
        desc = false, Seq(col("lat_us"), col("user_id"), col("sess")))
      .withColumnRenamed("__rank", "rn")
      .withColumnRenamed("__n", "n")
    def pick(q: Double) = max(when(
      col("rn") === greatest(ceil(lit(q) * col("n")).cast("long"), lit(1L)),
      col("lat_us")))
    ranked.agg(max(col("n")).as("converted_sessions"),
      divFloor(pick(0.5), 1000000L).as("p50_latency_s"),
      divFloor(pick(0.95), 1000000L).as("p95_latency_s"))
  }

  /** a38 (beyond-reference): exact engagement percentiles — the EXACT
    * sibling of the a26 histogram sketch: the per-user event-count
    * distribution's p25/p50/p75/p90/p99 picked at exact rank
    * positions (ceil(q·n), the classic discrete quantile), the
    * capacity-planning spine behind per-user state sizing and the a34
    * concentration read. Scale shape: events reduce to |users| rows
    * first; the rank comes from [[globalRank]] with exact-value
    * buckets (per-user event counts are a small distinct set — the
    * only unpartitioned window runs over that aggregate), so the
    * exact quantile never pays a single-task sort — when even the
    * count table is too wide, a26 is the fixed-memory path. */
  private def eventPercentiles(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("ev_ct"))
    val ranked = globalRank(perUser, col("ev_ct"), desc = false,
        Seq(col("user_id")))
      .withColumnRenamed("__rank", "rn")
      .withColumnRenamed("__n", "n")
    def pick(q: Double) = max(when(
      col("rn") === greatest(ceil(lit(q) * col("n")).cast("long"), lit(1L)),
      col("ev_ct")))
    ranked.agg(max(col("n")).as("user_ct"),
      min(col("ev_ct")).as("min_ct"),
      pick(0.25).as("p25"), pick(0.5).as("p50"), pick(0.75).as("p75"),
      pick(0.9).as("p90"), pick(0.99).as("p99"),
      max(col("ev_ct")).as("max_ct"))
  }

  /** a22: per-channel landing bounce rate — the traffic-window family's
    * user-jump metric (the reference pairs
    * DwsTrafficVcChArIsNewPageViewWindow's vc/ch/ar/is_new page-view
    * window with a CEP user-jump detail stream whose downstream report
    * is exactly bounced/total per dimension). Sessions are a23's 30-min
    * inactivity islands ([[sessionized]] — one shared gap rule, see its
    * doc); a session belongs to its LANDING event's channel (min
    * (us, event_id) — a genuine total order, so the landing pick is
    * deterministic), and a bounce is a single-event session — the CEP
    * pattern "entry followed by nothing within the gap" stated
    * declaratively. Scale: both aggregations ride the user_id Exchange
    * the sessionization already pays; the per-channel rollup is
    * |channels| rows with a map-side partial. */
  private def bounceRate(s: SparkSession, dir: String): DataFrame =
    sessionized(s, dir)
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("ev_ct"),
        min(struct(col("us"), col("event_id"), col("event_type")))
          .as("landing"))
      .select(col("landing.event_type").as("ch"), col("ev_ct"))
      .groupBy(col("ch"))
      .agg(count(lit(1)).as("session_ct"),
        sum(when(col("ev_ct") === 1, 1L).otherwise(0L)).as("bounce_ct"))
      .select(col("ch"), col("session_ct"), col("bounce_ct"),
        round(col("bounce_ct").cast(DoubleType) / col("session_ct"), 6)
          .as("bounce_rate"))

  /** a28 (beyond-reference): rolling 7-day active users — the DAU/WAU
    * stickiness report. Rolling DISTINCT counts can't ride a window
    * frame (distinct doesn't decompose over frames), so the scalable
    * form fans each DISTINCT (day, user) pair out to the 7 window-end
    * days it contributes to (a ×7 map-side explode of the already-
    * deduplicated pair list — not of the raw events) and distinct-
    * counts per window day. Day arithmetic is integer epoch-day
    * division (engine-exact, timezone-free). Output keeps only days
    * that had activity themselves (dau join wau), with
    * stickiness = dau/wau. Shuffles: one (day,user) dedup, one
    * window-day count — both map-side combinable. */
  private def rollingWau(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val du = Tables(s, dir, "events")
      .select(divFloor(nsToUs(col("ts")), dayUs).as("day"), col("user_id"))
      .distinct()
    // du is already distinct (day, user) — plain count IS the DAU;
    // the wau side genuinely needs countDistinct (a user active on two
    // days of one window fans out to the same wday twice)
    val dau = du.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), col("day") + 6L)).as("wday"),
        col("user_id"))
      .groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("wday"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast(DoubleType) / col("wau"), 6)
          .as("stickiness"))
  }

  /** a32 (beyond-reference): longest consecutive-day activity streak per
    * user — the engagement "streak" report next to a28's DAU/WAU ratio.
    * Classic gaps-and-islands: over the DISTINCT (user, day) pair list
    * (the same deduplicated spine a28 rides — never the raw events),
    * `day - row_number()` is constant exactly across a run of
    * consecutive days, so one user-keyed window sort + one
    * (user, island) count yields every streak; each user keeps their
    * best under a total (streak DESC, start_day ASC) order and the
    * report cuts to a deterministic top-10 (streak DESC, user_id) via
    * TakeOrderedAndProject. Day arithmetic is integer epoch-day
    * division — engine-exact, timezone-free. Shuffles: the pair dedup,
    * ONE user_id Exchange that serves both the island sort and both
    * per-user reductions, and the partial top-n; nothing touches the
    * raw event payload after the first projection. */
  private def activeStreak(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400L * 1000000L
    val du = Tables(s, dir, "events")
      .select(col("user_id"), divFloor(nsToUs(col("ts")), dayUs).as("day"))
      .distinct()
    val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
    du.withColumn("island", col("day") - row_number().over(wU))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("streak_days"), min(col("day")).as("start_day"))
      // best streak per user: longest, earliest-start on ties — one
      // struct-min over the (few) islands each user owns
      .groupBy(col("user_id"))
      .agg(min(struct((-col("streak_days")).as("neg"),
        col("start_day").as("sd"))).as("best"),
        count(lit(1)).as("island_ct"))
      .select(col("user_id"), (-col("best.neg")).as("streak_days"),
        curDate(col("best.sd") * 86400L).as("streak_start"),
        col("island_ct"))
      .orderBy(col("streak_days").desc, col("user_id"))
      .limit(10)
  }

  /** a33 (beyond-reference): session-gap calibration — the table that
    * JUSTIFIES the 30-minute inactivity rule every sessionized query
    * (a22/a23/a27/a29) hardcodes: the distribution of consecutive
    * same-user inter-event gaps, bucketed by fixed integer thresholds
    * (10 s / 1 m / 10 m / 30 m / 1 h / more) with per-bucket share and
    * cumulative share. A healthy cutoff sits where the cumulative curve
    * plateaus — cum_share at the `< 30 m` bucket is exactly the
    * fraction of event transitions the session rule keeps intact.
    * Shuffles: the same user_id Exchange the sessionization itself
    * pays (one lag read), then a 6-row rollup; integer second math,
    * CASE thresholds identical in both engines. */
  private def sessionGapCalibration(s: SparkSession, dir: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val grouped = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), nsToUs(col("ts")).as("us"))
      .withColumn("gap_s",
        divFloor(col("us") - lag(col("us"), 1).over(wU), 1000000L))
      .filter(col("gap_s").isNotNull)
      .withColumn("bucket",
        when(col("gap_s") < 10, "a_lt_10s")
          .when(col("gap_s") < 60, "b_lt_1m")
          .when(col("gap_s") < 600, "c_lt_10m")
          .when(col("gap_s") < 1800, "d_lt_30m")
          .when(col("gap_s") < 3600, "e_lt_1h")
          .otherwise("f_ge_1h"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("gap_ct"))
    // dense spine: an empty bucket must read 0, not vanish (the
    // c24/v23 zero-row discipline) — the report's six rows are fixed
    val spine = s.createDataFrame(
      java.util.Arrays.asList(
        Seq("a_lt_10s", "b_lt_1m", "c_lt_10m", "d_lt_30m", "e_lt_1h",
          "f_ge_1h").map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s_bucket",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val dense = spine.join(grouped, col("s_bucket") === col("bucket"),
        "left_outer")
      .select(col("s_bucket").as("bucket"),
        coalesce(col("gap_ct"), lit(0L)).as("gap_ct"))
    val wAll = Window.partitionBy(lit(1))
    val wCum = Window.partitionBy(lit(1)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dense
      .withColumn("total", sum(col("gap_ct")).over(wAll))
      .withColumn("cum_ct", sum(col("gap_ct")).over(wCum))
      .select(col("bucket"), col("gap_ct"),
        round(col("gap_ct").cast(DoubleType) / col("total"), 6)
          .as("share"),
        round(col("cum_ct").cast(DoubleType) / col("total"), 6)
          .as("cum_share"))
  }

  /** Global rank under a total order WITHOUT the single-task sort an
    * unpartitioned window pays: rank = cumulative count of rows in
    * strictly-earlier `bucket` groups (the offset, computed on the
    * per-distinct-bucket COUNT aggregate — the only unpartitioned
    * window, and it runs over |distinct buckets| rows, not over data)
    * + row_number within the bucket partition (parallel). `bucket`
    * must be monotone in the intended order: the sort column itself
    * for exact-value grouping, or any fixed-width coarsening (hour of
    * a timestamp, value DIV 8, floor(score×256)) when the sort column
    * is near-unique — coarsening keeps the offset aggregate
    * DOMAIN-bounded (time range, value range) instead of data-sized,
    * which is what survives a 100× corpus. `inBucket` is the
    * within-bucket residual order (sort column + tiebreaks, direction
    * applied by the caller; must totally order rows inside a bucket).
    * Adds `__rank` (LONG, 1-based) and `__n` (LONG, total rows). */
  private[graft] def globalRank(df: DataFrame, bucket: Column,
      desc: Boolean, inBucket: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = if (desc) col("__obk").desc else col("__obk").asc
    val cumW = Window.orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    val offs = df.groupBy(bucket.as("__obk")).agg(count(lit(1)).as("__g"))
      .withColumn("__off", sum(col("__g")).over(cumW) - col("__g"))
      .withColumn("__n",
        sum(col("__g")).over(Window.partitionBy(lit(1))))
      .select(col("__obk"), col("__off"), col("__n"))
    val inW = Window.partitionBy(bucket).orderBy(inBucket: _*)
    // null-SAFE join: ranking covers NULL bucket rows too (desc puts
    // them last, asc first — matching Spark's window null ordering); a
    // plain equi-join would silently drop them while __n still counted
    // them, shifting every downstream tile boundary
    df.join(broadcast(offs), bucket <=> col("__obk"))
      .withColumn("__rank", col("__off") + row_number().over(inW))
      .drop("__obk", "__off")
  }

  /** Exact ntile(n) over the [[globalRank]] decomposition — bit-equal
    * to `ntile(n).over(Window.orderBy(...))` (spec-proven) with no
    * single-task data sort. ntile's front-loaded tiles (the first
    * N%n tiles take N/n+1 rows) become closed-form integer arithmetic
    * on the rank. N < n never reaches the divide-by-(N DIV n) branch:
    * every rank ≤ rem·(q+1) = N, and CaseWhen evaluates lazily. */
  private[graft] def exactNtile(df: DataFrame, n: Int, bucket: Column,
      desc: Boolean, inBucket: Seq[Column], out: String): DataFrame =
    globalRank(df, bucket, desc, inBucket)
      .withColumn(out,
        when(col("__rank") <=
            (col("__n") % n) * (expr(s"__n DIV $n") + lit(1L)),
          expr(s"(__rank - 1) DIV (__n DIV $n + 1) + 1"))
          .otherwise(expr(
            s"__n % $n + (__rank - (__n % $n) * (__n DIV $n + 1) - 1)" +
              s" DIV (__n DIV $n) + 1"))
          .cast(IntegerType))
      .drop("__n", "__rank")

  /** Several [[exactNtile]] assignments over ONE frame, sharing a
    * single bucket-statistics pass. The sequential chain pays one
    * offsets aggregate per tile — and because each stage's offsets
    * re-aggregate the PREVIOUS stage's frame, the frame's lineage
    * (for a37: the whole events→per-user reduction) re-executes per
    * tile, which is what tripled a37's wall time in round 10. Every
    * spec's bucket is a function of the frame's own columns, so all
    * the per-bucket counts fold into one GROUPING SETS aggregate (one
    * Expand ×k over ONE execution of the frame); each set's rows are
    * picked out by grouping_id, cumulated into offsets on the
    * domain-bounded bucket counts, and broadcast back exactly like
    * the single-spec path. Each spec is (n, bucket, desc, inBucket,
    * out) with [[exactNtile]]'s semantics; assignments are bit-equal
    * to the chained form (spec-proven) because a tile depends only on
    * its own (bucket, inBucket) columns. */
  private[graft] def exactNtileMulti(df: DataFrame,
      specs: Seq[(Int, Column, Boolean, Seq[Column], String)])
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = specs.size
    val withBuckets = specs.zipWithIndex.foldLeft(df) {
      case (acc, ((_, bucket, _, _, _), i)) =>
        acc.withColumn(s"__b$i", bucket)
    }
    // one pass: per-set bucket counts; grouping_id for set i (only
    // __b{i} grouped, the rest aggregated away) = (2^k - 1) - 2^(k-1-i)
    val sets = withBuckets.groupingSets(
        specs.indices.map(i => Seq(col(s"__b$i"))),
        specs.indices.map(i => col(s"__b$i")): _*)
      .agg(count(lit(1)).as("__g"), grouping_id().as("__gid"))
    specs.zipWithIndex.foldLeft(withBuckets) {
      case (acc, ((n, _, desc, inBucket, out), i)) =>
        val gid = (1L << k) - 1L - (1L << (k - 1 - i))
        val ord = if (desc) col("__obk").desc else col("__obk").asc
        val cumW = Window.orderBy(ord)
          .rowsBetween(Window.unboundedPreceding, 0)
        val offs = sets.filter(col("__gid") === gid)
          .select(col(s"__b$i").as("__obk"), col("__g"))
          .withColumn("__off", sum(col("__g")).over(cumW) - col("__g"))
          .withColumn("__n",
            sum(col("__g")).over(Window.partitionBy(lit(1))))
          .select(col("__obk"), col("__off"), col("__n"))
        val inW = Window.partitionBy(col(s"__b$i")).orderBy(inBucket: _*)
        // null-SAFE join — same contract as [[globalRank]]
        acc.join(broadcast(offs), col(s"__b$i") <=> col("__obk"))
          .withColumn("__rank", col("__off") + row_number().over(inW))
          .withColumn(out,
            when(col("__rank") <=
                (col("__n") % n) * (expr(s"__n DIV $n") + lit(1L)),
              expr(s"(__rank - 1) DIV (__n DIV $n + 1) + 1"))
              .otherwise(expr(
                s"__n % $n + (__rank - (__n % $n) * (__n DIV $n + 1) - 1)" +
                  s" DIV (__n DIV $n) + 1"))
              .cast(IntegerType))
          .drop("__obk", "__off", "__n", "__rank")
    }.drop(specs.indices.map(i => s"__b$i"): _*)
  }

  /** ntile(10) over (sortCol DESC, tiebreak ASC) — the a34 shape, a
    * direct [[exactNtile]] with exact-value buckets (a34's sort key is
    * a small-count aggregate, already domain-bounded). */
  private[graft] def deciles(df: DataFrame, sortCol: String,
      tiebreak: String): DataFrame =
    exactNtile(df, 10, col(sortCol), desc = true, Seq(col(tiebreak)),
      "decile")

  /** a34 (beyond-reference): user-concentration deciles — the Pareto
    * table behind every "whales" question (and the skew early-warning
    * x10 reads per KEY, restated per USER): users ranked by event count
    * into ntile(10) deciles under a (count DESC, user_id) total order;
    * per decile: users, events, share, cumulative share. An 80/20-style
    * cum_share at decile 1-2 says engagement (and any per-user state at
    * 100 TB) concentrates — the input to per-user salting and quota
    * decisions. Integer counts with one-shot final divisions; the tile
    * assignment comes from [[deciles]] (no single-task global sort),
    * spec-proven equal to the plain ntile window. */
  private def userConcentration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("ev_ct"))
    val dec = deciles(perUser, "ev_ct", "user_id")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("user_ct"), sum(col("ev_ct")).as("event_ct"))
    val wAll = Window.partitionBy(lit(1))
    val wCum = Window.partitionBy(lit(1)).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dec
      .withColumn("total", sum(col("event_ct")).over(wAll))
      .withColumn("cum_ct", sum(col("event_ct")).over(wCum))
      .select(col("decile"), col("user_ct"), col("event_ct"),
        round(col("event_ct").cast(DoubleType) / col("total"), 6)
          .as("share"),
        round(col("cum_ct").cast(DoubleType) / col("total"), 6)
          .as("cum_share"))
  }

  /** a35 (beyond-reference): event-type Markov transition matrix — the
    * one-step generalization of a29's top paths: every adjacent event
    * pair inside a user's (time, event_id) order counted into a
    * src→dst matrix with row-normalized probabilities, the standing
    * input to next-action prediction and to funnel-shape drift
    * monitoring. Shuffles: the user-keyed window (shared sort shape
    * with a29/a23), one (src,dst) rollup, and a |types|²-row
    * normalization window — metadata-sized. */
  private def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val pairs = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        nsToUs(col("ts")).as("us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src_type"),
        col("next_type").as("dst_type"))
      .agg(count(lit(1)).as("pair_ct"))
    pairs.withColumn("prob",
      round(col("pair_ct").cast(DoubleType) /
        sum(col("pair_ct")).over(Window.partitionBy(col("src_type"))), 6))
  }

  /** a36 (beyond-reference): multi-touch marketing attribution — the
    * standard revenue-credit report over the clickstream: each
    * purchase's value is credited to the user's view/click touches in
    * the preceding hour, under BOTH classic models at once — last-touch
    * (all credit to the latest touch) and linear (credit split equally
    * across the window's touches) — plus the untouched-purchase bucket
    * the budget meeting always asks about.
    *
    * Scale shape (round-9, the j9 integer-bucket decomposition): the
    * purchase-to-touch pairing joins on (user, HOUR BUCKET) — a
    * 1-hour horizon spans at most two hour buckets, so each purchase
    * probes exactly two (user, bucket) cells and the time predicate
    * rides the hash join. A whale user's pair enumeration is thereby
    * bounded per bucket (purchases-that-hour × touches-that-hour),
    * never all-purchases × all-touches before the horizon filter —
    * the round-8 verdict's hyperactive-user concern. Untouched
    * purchases ride as ONE map-side sentinel row each (null channel,
    * sorts last in the rank window), so the whole report stays a
    * single linear plan — no left-outer over the bucket explosion, no
    * second consumption of the join for an anti-join. One
    * purchase-keyed window then ranks/counts touches, exactly as
    * before.
    * Float discipline: the linear split value/n is a per-row IEEE
    * division (identical both engines), quantized to DECIMAL(28,6)
    * before the cross-row sum so partition order can't change the
    * cents. */
  val attributionHorizonSec = 3600L

  /** The bucketed purchase×touch pairing — exposed for the whale-user
    * spec, which asserts the enumeration stays per-bucket-bounded.
    * Inputs: purchases (p_uid, p_id, p_sec, p_value), touches
    * (t_uid, t_id, t_sec, channel). Output: one row per qualifying
    * (purchase, touch) pair — each pair matches in exactly ONE bucket
    * (the touch's own), so no dedup is needed. */
  private[graft] def attributionPairs(purchases: DataFrame,
      touches: DataFrame): DataFrame = {
    val h = attributionHorizonSec
    val probes = purchases
      .withColumn("pb0", floor(col("p_sec") / h))
      .withColumn("pb", explode(array(col("pb0") - 1, col("pb0"))))
    probes.join(touches.withColumn("tb", floor(col("t_sec") / h)),
        col("p_uid") === col("t_uid") && col("pb") === col("tb") &&
          col("t_sec") <= col("p_sec") &&
          col("t_sec") >= col("p_sec") - h)
      .select(col("p_id"), col("p_value"), col("channel"), col("t_sec"),
        col("t_id"))
  }

  /** The full a36 report over arbitrary purchase/touch frames (the
    * spec's semantic-equality handle). */
  private[graft] def attributionFor(purchases: DataFrame,
      touches: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one sentinel per purchase: null channel/touch, sorts last in the
    // rank window — carries the untouched-purchase credit exactly like
    // the previous left-outer's null-extended row, but map-side
    val sentinels = purchases.select(col("p_id"), col("p_value"),
      lit(null).cast(org.apache.spark.sql.types.StringType).as("channel"),
      lit(null).cast(LongType).as("t_sec"),
      lit(null).cast(LongType).as("t_id"))
    val wP = Window.partitionBy(col("p_id"))
    val ranked = attributionPairs(purchases, touches)
      .unionByName(sentinels)
      .withColumn("n_touches", count(col("t_id")).over(wP))
      .withColumn("rk", row_number().over(
        wP.orderBy(col("t_sec").desc_nulls_last, col("t_id").desc_nulls_last)))
    ranked
      .select(coalesce(col("channel"), lit("(none)")).as("channel"),
        when(col("rk") === 1, 1L).otherwise(0L).as("is_last"),
        when(col("rk") === 1, money(col("p_value")))
          .otherwise(lit(null)).as("lt_rev"),
        // the sentinel of a TOUCHED purchase (t_id null, n_touches>0)
        // must not draw a linear share — only real touch rows split
        when(col("n_touches") > 0 && col("t_id").isNotNull,
          round(col("p_value") / col("n_touches"), 6)
            .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .when(col("n_touches") === 0 && col("rk") === 1,
            money(col("p_value")).cast(
              org.apache.spark.sql.types.DecimalType(28, 6)))
          .otherwise(lit(null)).as("lin_rev"))
      .groupBy(col("channel"))
      .agg(sum(col("is_last")).as("purchase_ct"),
        sum(col("lt_rev")).cast(DoubleType).as("last_touch_revenue"),
        sum(col("lin_rev")).cast(DoubleType).as("linear_revenue"))
      // a TOUCHED purchase's sentinel contributes nothing (rk >= 2,
      // null credits) — but it still creates the "(none)" GROUP, which
      // the left-outer formulation only had when an untouched purchase
      // existed. Drop the group when it carries no purchases, exactly
      // restoring the join semantics (an all-touched corpus must not
      // grow a zero-purchase channel).
      .filter(col("channel") =!= "(none)" || col("purchase_ct") > 0)
  }

  /** a37 (beyond-reference): RFM segmentation — the classic
    * marketing user-base cut the serving layer publishes next to the
    * a34 concentration report: per user, Recency (latest event
    * second), Frequency (purchase count) and Monetary (exact DECIMAL
    * purchase value) are quintiled into 1..5 scores — ntile over a
    * TOTAL order (metric, then user_id), so ties split
    * deterministically and identically in both engines — and the
    * report folds to one row per (r, f, m) segment with its user
    * count and monetary mass. Scale shape: one user-keyed aggregate
    * reduces events to |users| rows FIRST; the three quintile
    * assignments go through [[exactNtile]] (bit-equal to the window
    * ntile, spec-proven) so no score ever pays a single-task sort of
    * the user table — offsets come from DOMAIN-bounded buckets
    * (recency by hour: bounded by the time range; monetary DIV 8:
    * bounded by the spend range; frequency exact: purchase counts are
    * a small set), each a broadcast-joined metadata-sized aggregate. */
  private def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val zero = lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val perUser = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        nsToSec(col("ts")).as("sec"), col("value"))
      .groupBy(col("user_id"))
      .agg(max(col("sec")).as("recency_sec"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("freq"),
        coalesce(sum(when(col("event_type") === "purchase",
          money(col("value")))), zero).as("monetary"))
    // all three tiles over the SAME per-user frame, one shared
    // bucket-statistics pass ([[exactNtileMulti]]): the chained form
    // re-executed the events reduction once per tile's offsets. The
    // frame is locally checkpointed (lazily — the materialization runs
    // inside the query's own first action, so ledgers see it): the
    // offsets pass and the three tile windows are FOUR consumers of
    // one |users|-sized reduction, and Catalyst's exchange reuse can't
    // cover them (column pruning specializes each branch's partial
    // aggregate, so the canonical exchanges differ); pinning the RDD
    // makes the scheduler run the events reduction once. At 100 TB the
    // pinned frame is |users|-sized — orders of magnitude under the
    // fact table the reduction reads.
    val pinned = perUser.localCheckpoint(false)
    val rfm = exactNtileMulti(pinned, Seq(
      (5, expr("recency_sec DIV 3600"), false,
        Seq(col("recency_sec"), col("user_id")), "r_score"),
      (5, col("freq"), false, Seq(col("user_id")), "f_score"),
      (5, floor(col("monetary") / 8).cast(LongType), false,
        Seq(col("monetary"), col("user_id")), "m_score")))
    rfm
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("user_ct"),
        sum(col("monetary")).cast(DoubleType).as("monetary_sum"))
  }

  private def attribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        nsToSec(col("ts")).as("sec"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("p_id"),
        col("sec").as("p_sec"), col("value").as("p_value"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_uid"), col("event_id").as("t_id"),
        col("sec").as("t_sec"), col("event_type").as("channel"))
    attributionFor(purchases, touches)
  }

  /** a29 (beyond-reference): top navigation paths — the classic
    * clickstream path-analysis report: the most common 3-step
    * event-type sequences inside a 30-min session (a23's
    * sessionization), counted corpus-wide and cut to a deterministic
    * top-10. Steps are adjacent events in (time, event_id) order
    * within one session — two lead() reads off the SAME window sort
    * the sessionization already pays; the top-10 is
    * TakeOrderedAndProject (partial top-n per partition, no full
    * sort). */
  private def topPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wS = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("us"), col("event_id"))
    sessionized(s, dir)
      .withColumn("e2", lead(col("event_type"), 1).over(wS))
      .withColumn("e3", lead(col("event_type"), 2).over(wS))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("path_ct"))
      .orderBy(col("path_ct").desc, col("path"))
      .limit(10)
  }

  /** a24 (beyond-reference): the cohort-retention matrix — users
    * cohorted by their first signup week, counted as retained in each
    * later activity week: (cohort_week, week_offset, active_users).
    * Week indexes are integer epoch-microsecond division (engine-exact,
    * timezone-free); the cohort table joins back onto per-user-week
    * activity — two user-keyed aggregations and one join, the matrix
    * itself bounded by weeks × offsets. The a14 cohort set-ops give two
    * cells of this matrix; this is the full triangular report. */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val e = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        divFloor(nsToUs(col("ts")), weekUs).as("wk"))
    val cohorts = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    val activity = e.select(col("user_id").as("a_uid"), col("wk")).distinct()
    cohorts.join(activity, col("user_id") === col("a_uid"))
      .select(col("user_id"), col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .filter(col("week_offset") >= 0 && col("week_offset") <= 8)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** W6 (late-data drop, upgraded from spec-only to oracle-checked): a
    * deterministic batch replay of the watermark drop rule the streaming
    * apps run live (StreamingSpec's closed-window assert). The testdata
    * has no arrival timestamps (event_id is perfectly event-time-ordered
    * — a stream with zero disorder never drops anything), so arrival is
    * modeled as event time + a deterministic network delay of
    * (event_id % 13) × 15 s, and ingest is chunked into 60 s ARRIVAL-time
    * micro-batches (the trigger-interval analog). Structured Streaming
    * advances the watermark from data seen in PRIOR batches, so the
    * watermark in force during batch k is max(event time over batches
    * < k) − 3 s (the W2 delay, KeywordApp.scala); an event whose 10 s
    * window END is ≤ that watermark arrives after its window closed and
    * is dropped. Output: per-window arrived/late/kept counts — the audit
    * a pipeline owner reads to size the delay (here ~4% of events at
    * sf0.01, because the ±3 min disorder dwarfs the 3 s allowance).
    * Scale shape: the per-batch max is a map-side-combined aggregate down
    * to #micro-batches rows; the running max runs over THAT tiny spine
    * (its size is wall-clock-span / 60 s — independent of data volume),
    * which then broadcasts back onto the events scan; the big table pays
    * one scan and one window-keyed hash aggregate. */
  private def lateAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val delayUs = 3000000L // W2 watermark delay: 3 s
    val winUs = 10000000L  // W3 window width: 10 s
    val e = Tables(s, dir, "events")
      .select(col("event_id"), nsToUs(col("ts")).as("us"))
      .withColumn("blk", divFloor(
        col("us") + (col("event_id") % 13) * lit(15000000L), 60000000L))
    // the watermark is an EXCLUSIVE running max over minute blocks —
    // decomposed as a two-level prefix scan so no single task ever
    // sorts the block table (minute blocks grow with stream DURATION;
    // one global window over them is the 100×-run bottleneck the
    // FLAG_GLOBAL ledger column catches): a parallel within-day
    // running max + a day-level prefix max over the ~|days| aggregate
    // (the only unpartitioned window — calendar-sized).
    val wDayPrev = Window.partitionBy(col("day")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDaysPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blk0 = e.groupBy(col("blk")).agg(max(col("us")).as("blk_max_us"))
      .withColumn("day", expr("blk DIV 1440"))
      .withColumn("in_day_prev", max(col("blk_max_us")).over(wDayPrev))
    val dayPrefix = blk0.groupBy(col("day"))
      .agg(max(col("blk_max_us")).as("day_max"))
      .withColumn("prev_day_max", max(col("day_max")).over(wDaysPrev))
      .select(col("day").as("p_day"), col("prev_day_max"))
    val blocks = blk0
      .join(broadcast(dayPrefix), col("day") === col("p_day"))
      // greatest skips nulls: null only for the very first block ever
      .withColumn("wm_us",
        greatest(col("in_day_prev"), col("prev_day_max")) - delayUs)
      .select(col("blk").as("b_blk"), col("wm_us"))
    e.join(broadcast(blocks), col("blk") === col("b_blk"))
      .withColumn("ws_sec", divFloor(col("us"), winUs) * lit(10L))
      .withColumn("late",
        col("wm_us").isNotNull &&
          (divFloor(col("us"), winUs) + 1) * winUs <= col("wm_us"))
      .groupBy(col("ws_sec"))
      .agg(count(lit(1)).as("arrived_ct"),
        sum(when(col("late"), 1L).otherwise(0L)).as("late_ct"))
      .select(stt(col("ws_sec")).as("stt"),
        edt(col("ws_sec"), 10L).as("edt"),
        col("arrived_ct"), col("late_ct"),
        (col("arrived_ct") - col("late_ct")).as("kept_ct"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "w6_late_audit" -> lateAudit,
    "a22_bounce_rate" -> bounceRate,
    "a29_top_paths" -> topPaths,
    "a28_rolling_wau" -> rollingWau,
    "a32_active_streak" -> activeStreak,
    "a33_session_gap_calibration" -> sessionGapCalibration,
    "a34_user_concentration" -> userConcentration,
    "a35_markov_transitions" -> markovTransitions,
    "a36_attribution" -> attribution,
    "a37_rfm_segments" -> rfmSegments,
    "a38_event_percentiles" -> eventPercentiles,
    "a27_conversion_latency" -> conversionLatency,
    "a24_cohort_retention" -> cohortRetention,
    "a23_session_funnel" -> sessionFunnel,
    "w5_sliding_window" -> slidingWindow,
    "w5_session_window" -> sessionWindow,
    "a1_keyword_window_count" -> keywordWindowCount,
    "a2_traffic_window" -> trafficWindow,
    "a2_traffic_bean_window" -> trafficBeanWindow,
    "a5_global_window" -> globalWindow,
    "a4_province_order_window" -> provinceOrderWindow,
    "a3_pricing_summary" -> pricingSummary)

  val oracles = Map(
    "a36_attribution" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type,
         |         ${Oracle.sec()} AS sec, "value" AS v
         |  FROM events),
         |p AS (SELECT user_id AS p_uid, event_id AS p_id, sec AS p_sec,
         |             v AS p_value
         |      FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id AS t_uid, event_id AS t_id, sec AS t_sec,
         |             event_type AS channel
         |      FROM e WHERE event_type IN ('view', 'click')),
         |j AS (
         |  SELECT p.p_id, p.p_value, t.t_id, t.t_sec, t.channel
         |  FROM p LEFT JOIN t
         |    ON p.p_uid = t.t_uid AND t.t_sec <= p.p_sec
         |   AND t.t_sec >= p.p_sec - $attributionHorizonSec),
         |r AS (
         |  SELECT *,
         |         count(t_id) OVER (PARTITION BY p_id) AS n_touches,
         |         row_number() OVER (PARTITION BY p_id
         |           ORDER BY t_sec DESC NULLS LAST, t_id DESC NULLS LAST)
         |           AS rk
         |  FROM j)
         |SELECT coalesce(channel, '(none)') AS channel,
         |       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS purchase_ct,
         |       CAST(sum(CASE WHEN rk = 1
         |                     THEN CAST(p_value AS DECIMAL(18,2)) END)
         |            AS DOUBLE) AS last_touch_revenue,
         |       CAST(sum(CASE
         |           WHEN n_touches > 0 THEN
         |             CAST(round(p_value / n_touches, 6) AS DECIMAL(28,6))
         |           WHEN rk = 1 THEN
         |             CAST(CAST(p_value AS DECIMAL(18,2)) AS DECIMAL(28,6))
         |         END) AS DOUBLE) AS linear_revenue
         |FROM r GROUP BY 1""".stripMargin,
    "a37_rfm_segments" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |         max(${Oracle.sec()}) AS recency_sec,
         |         CAST(sum(CASE WHEN event_type = 'purchase'
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS freq,
         |         coalesce(sum(CASE WHEN event_type = 'purchase'
         |                           THEN CAST("value" AS DECIMAL(18,2))
         |                      END),
         |                  CAST(0 AS DECIMAL(18,2))) AS monetary
         |  FROM events GROUP BY 1),
         |sc AS (
         |  SELECT monetary,
         |         ntile(5) OVER (ORDER BY recency_sec, user_id) AS r_score,
         |         ntile(5) OVER (ORDER BY freq, user_id) AS f_score,
         |         ntile(5) OVER (ORDER BY monetary, user_id) AS m_score
         |  FROM pu)
         |SELECT r_score, f_score, m_score,
         |       CAST(count(*) AS BIGINT) AS user_ct,
         |       CAST(sum(monetary) AS DOUBLE) AS monetary_sum
         |FROM sc GROUP BY 1, 2, 3""".stripMargin,
    "a38_event_percentiles" -> {
      def pick(q: String) =
        s"""CAST(max(CASE WHEN rn = greatest(
           |           CAST(ceil($q * n) AS BIGINT), 1)
           |         THEN ev_ct END) AS BIGINT)""".stripMargin
      s"""WITH pu AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS ev_ct
         |  FROM events GROUP BY 1),
         |r AS (
         |  SELECT ev_ct,
         |         row_number() OVER (ORDER BY ev_ct, user_id) AS rn,
         |         count(*) OVER () AS n
         |  FROM pu)
         |SELECT CAST(max(n) AS BIGINT) AS user_ct,
         |       min(ev_ct) AS min_ct,
         |       ${pick("0.25")} AS p25,
         |       ${pick("0.5")} AS p50,
         |       ${pick("0.75")} AS p75,
         |       ${pick("0.9")} AS p90,
         |       ${pick("0.99")} AS p99,
         |       max(ev_ct) AS max_ct
         |FROM r""".stripMargin
    },
    "w6_late_audit" ->
      s"""WITH e AS (
         |  SELECT (epoch_us(ts) + (event_id % 13) * 15000000) // 60000000
         |           AS blk,
         |         epoch_us(ts) AS us
         |  FROM events),
         |b AS (SELECT blk, max(us) AS blk_max_us FROM e GROUP BY 1),
         |w AS (
         |  SELECT blk,
         |         max(blk_max_us) OVER (ORDER BY blk
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           - 3000000 AS wm_us
         |  FROM b),
         |f AS (
         |  SELECT e.us // 10000000 AS win,
         |         CASE WHEN w.wm_us IS NOT NULL
         |               AND (e.us // 10000000 + 1) * 10000000 <= w.wm_us
         |              THEN 1 ELSE 0 END AS late
         |  FROM e JOIN w ON e.blk = w.blk)
         |SELECT ${Oracle.fmtTs("win * 10")} AS stt,
         |       ${Oracle.fmtTs("win * 10 + 10")} AS edt,
         |       count(*) AS arrived_ct,
         |       CAST(sum(late) AS BIGINT) AS late_ct,
         |       CAST(count(*) - sum(late) AS BIGINT) AS kept_ct
         |FROM f GROUP BY 1, 2""".stripMargin,
    "a24_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         epoch_us(ts) // 604800000000 AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week
        |      FROM e WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id AS a_uid, wk FROM e),
        |j AS (SELECT c.user_id, cohort_week, wk - cohort_week AS week_offset
        |      FROM c JOIN a ON c.user_id = a.a_uid)
        |SELECT cohort_week, week_offset,
        |       count(DISTINCT user_id) AS active_users
        |FROM j WHERE week_offset BETWEEN 0 AND 8
        |GROUP BY 1, 2""".stripMargin,
    "a29_top_paths" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
         |  FROM events),
         |g AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |                   OR us - lag(us) OVER w > $sessGapUs
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM g),
         |steps AS (
         |  SELECT event_type,
         |         lead(event_type, 1) OVER w2 AS e2,
         |         lead(event_type, 2) OVER w2 AS e3
         |  FROM sess
         |  WINDOW w2 AS (PARTITION BY user_id, sess
         |                ORDER BY us, event_id))
         |SELECT event_type || '>' || e2 || '>' || e3 AS path,
         |       CAST(count(*) AS BIGINT) AS path_ct
         |FROM steps WHERE e3 IS NOT NULL
         |GROUP BY 1 ORDER BY path_ct DESC, path LIMIT 10""".stripMargin,
    "a35_markov_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events),
        |p AS (
        |  SELECT event_type AS src_type, next_type AS dst_type,
        |         CAST(count(*) AS BIGINT) AS pair_ct
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src_type, dst_type, pair_ct,
        |       round(CAST(pair_ct AS DOUBLE)
        |             / sum(pair_ct) OVER (PARTITION BY src_type), 6)
        |         AS prob
        |FROM p""".stripMargin,
    "a34_user_concentration" ->
      """WITH pu AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS ev_ct
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT ntile(10) OVER (ORDER BY ev_ct DESC, user_id) AS decile,
        |         ev_ct
        |  FROM pu),
        |g AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS user_ct,
        |         CAST(sum(ev_ct) AS BIGINT) AS event_ct
        |  FROM d GROUP BY 1)
        |SELECT CAST(decile AS INTEGER) AS decile, user_ct, event_ct,
        |       round(CAST(event_ct AS DOUBLE) / sum(event_ct) OVER (), 6)
        |         AS share,
        |       round(CAST(sum(event_ct) OVER (ORDER BY decile
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS DOUBLE) / sum(event_ct) OVER (), 6) AS cum_share
        |FROM g""".stripMargin,
    "a33_session_gap_calibration" ->
      """WITH g AS (
        |  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER
        |            (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |         // 1000000 AS gap_s
        |  FROM events),
        |b AS (
        |  SELECT CASE WHEN gap_s < 10 THEN 'a_lt_10s'
        |              WHEN gap_s < 60 THEN 'b_lt_1m'
        |              WHEN gap_s < 600 THEN 'c_lt_10m'
        |              WHEN gap_s < 1800 THEN 'd_lt_30m'
        |              WHEN gap_s < 3600 THEN 'e_lt_1h'
        |              ELSE 'f_ge_1h' END AS bucket,
        |         CAST(count(*) AS BIGINT) AS gap_ct
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1),
        |d AS (
        |  SELECT s_bucket AS bucket, coalesce(gap_ct, 0) AS gap_ct
        |  FROM (SELECT unnest(['a_lt_10s', 'b_lt_1m', 'c_lt_10m',
        |                       'd_lt_30m', 'e_lt_1h', 'f_ge_1h'])
        |          AS s_bucket)
        |  LEFT JOIN b ON s_bucket = b.bucket)
        |SELECT bucket, CAST(gap_ct AS BIGINT) AS gap_ct,
        |       round(CAST(gap_ct AS DOUBLE) / sum(gap_ct) OVER (), 6)
        |         AS share,
        |       round(CAST(sum(gap_ct) OVER (ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS DOUBLE) / sum(gap_ct) OVER (), 6) AS cum_share
        |FROM d""".stripMargin,
    "a32_active_streak" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id,
        |         day - row_number() OVER
        |           (PARTITION BY user_id ORDER BY day) AS island,
        |         day
        |  FROM du),
        |runs AS (
        |  SELECT user_id, island,
        |         CAST(count(*) AS BIGINT) AS streak_days,
        |         min(day) AS start_day
        |  FROM isl GROUP BY user_id, island),
        |best AS (
        |  SELECT user_id,
        |         CAST(max(streak_days) AS BIGINT) AS streak_days,
        |         min(CASE WHEN streak_days = md THEN start_day END)
        |           AS start_day,
        |         CAST(count(*) AS BIGINT) AS island_ct
        |  FROM (SELECT *, max(streak_days) OVER (PARTITION BY user_id)
        |          AS md FROM runs)
        |  GROUP BY user_id)
        |SELECT user_id, streak_days,
        |       strftime(make_timestamp(start_day * 86400000000),
        |                '%Y-%m-%d') AS streak_start,
        |       island_ct
        |FROM best
        |ORDER BY streak_days DESC, user_id LIMIT 10""".stripMargin,
    "a28_rolling_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau
        |  FROM du GROUP BY 1),
        |f AS (
        |  SELECT day + r AS wday, user_id
        |  FROM du CROSS JOIN range(0, 7) t(r)),
        |wau AS (
        |  SELECT wday, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM f GROUP BY 1)
        |SELECT day, dau, wau,
        |       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau ON day = wday""".stripMargin,
    "a27_conversion_latency" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
         |  FROM events),
         |g AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |                   OR us - lag(us) OVER w > $sessGapUs
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM g),
         |f1 AS (
         |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
         |              OVER (PARTITION BY user_id, sess) AS v1
         |  FROM sess),
         |f2 AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us >= v1
         |                     THEN us END)
         |              OVER (PARTITION BY user_id, sess) AS p1
         |  FROM f1),
         |per AS (
         |  SELECT user_id, sess, max(v1) AS v1, max(p1) AS p1
         |  FROM f2 GROUP BY 1, 2),
         |lat AS (
         |  SELECT user_id, sess, p1 - v1 AS lat_us
         |  FROM per WHERE v1 IS NOT NULL AND p1 IS NOT NULL),
         |r AS (
         |  SELECT *, row_number() OVER (ORDER BY lat_us, user_id, sess)
         |              AS rn,
         |         count(*) OVER () AS n
         |  FROM lat)
         |SELECT CAST(max(n) AS BIGINT) AS converted_sessions,
         |       CAST(max(CASE WHEN rn = greatest(
         |                CAST(ceil(0.5 * n) AS BIGINT), 1)
         |              THEN lat_us END) // 1000000 AS BIGINT)
         |         AS p50_latency_s,
         |       CAST(max(CASE WHEN rn = greatest(
         |                CAST(ceil(0.95 * n) AS BIGINT), 1)
         |              THEN lat_us END) // 1000000 AS BIGINT)
         |         AS p95_latency_s
         |FROM r""".stripMargin,
    "a22_bounce_rate" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
         |  FROM events),
         |g AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |                   OR us - lag(us) OVER w > $sessGapUs
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM g),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, sess
         |               ORDER BY us, event_id) AS rn,
         |         count(*) OVER (PARTITION BY user_id, sess) AS ev_ct
         |  FROM sess),
         |land AS (SELECT event_type AS ch, ev_ct FROM ranked WHERE rn = 1)
         |SELECT ch, CAST(count(*) AS BIGINT) AS session_ct,
         |       CAST(sum(CASE WHEN ev_ct = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS bounce_ct,
         |       round(CAST(sum(CASE WHEN ev_ct = 1 THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*), 6) AS bounce_rate
         |FROM land GROUP BY 1""".stripMargin,
    "a23_session_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
         |  FROM events),
         |g AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |                   OR us - lag(us) OVER w > $sessGapUs
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM g),
         |f1 AS (
         |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
         |              OVER (PARTITION BY user_id, sess) AS s1
         |  FROM sess),
         |f2 AS (
         |  SELECT *, min(CASE WHEN event_type = 'click' AND us >= s1
         |                     THEN us END)
         |              OVER (PARTITION BY user_id, sess) AS s2
         |  FROM f1),
         |f3 AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us >= s2
         |                     THEN us END)
         |              OVER (PARTITION BY user_id, sess) AS s3
         |  FROM f2),
         |per AS (
         |  SELECT user_id, sess, max(s1) AS v1, max(s2) AS v2, max(s3) AS v3
         |  FROM f3 GROUP BY 1, 2)
         |SELECT count(*) AS sessions,
         |       CAST(sum(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS viewed,
         |       CAST(sum(CASE WHEN v2 IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS clicked_after_view,
         |       CAST(sum(CASE WHEN v3 IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS purchased_after_click
         |FROM per""".stripMargin,
    "w5_sliding_window" ->
      s"""WITH expanded AS (
         |  SELECT event_type AS ch,
         |         (${Oracle.sec()} // 10 - unnest(range(0, 3))) * 10 AS ws
         |  FROM events)
         |SELECT ${Oracle.fmtTs("ws")} AS stt,
         |       ${Oracle.fmtTs("ws + 30")} AS edt,
         |       ch, count(*) AS pv_ct
         |FROM expanded GROUP BY 1, 2, 3""".stripMargin,
    "w5_session_window" ->
      s"""WITH evts AS (
         |  SELECT user_id, ${Oracle.sec()} AS sec,
         |         ${Oracle.money("\"value\"")} AS v
         |  FROM events),
         |marked AS (
         |  SELECT user_id, sec, v,
         |         -- Spark merges TOUCHING session ranges ([t, t+gap) with
         |         -- next start == end) → a new session needs gap > 1800
         |         CASE WHEN sec - lag(sec) OVER
         |             (PARTITION BY user_id ORDER BY sec) > 1800
         |           OR lag(sec) OVER (PARTITION BY user_id ORDER BY sec)
         |              IS NULL THEN 1 ELSE 0 END AS is_new
         |  FROM evts),
         |sessions AS (
         |  SELECT user_id, sec, v,
         |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec
         |           ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM marked)
         |SELECT user_id,
         |       ${Oracle.fmtTs("MIN(sec)")} AS session_start,
         |       ${Oracle.fmtTs("MAX(sec) + 1800")} AS session_end,
         |       count(*) AS event_ct,
         |       CAST(SUM(v) AS DOUBLE) AS value_sum
         |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "a1_keyword_window_count" ->
      s"""SELECT ${Oracle.fmtTs(Oracle.wsec(10))} AS stt,
         |       ${Oracle.fmtTs(Oracle.wsec(10) + " + 10")} AS edt,
         |       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS keyword,
         |       count(*) AS kw_ct
         |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "a2_traffic_window" ->
      s"""SELECT ${Oracle.fmtTs(Oracle.wsec(3600))} AS stt,
         |       ${Oracle.fmtTs(Oracle.wsec(3600) + " + 3600")} AS edt,
         |       ${Oracle.fmtDate(Oracle.wsec(3600))} AS cur_date,
         |       event_type AS ch,
         |       count(*) AS pv_ct,
         |       count(DISTINCT user_id) AS uv_ct,
         |       ${Oracle.moneySum("\"value\"")} AS dur_sum
         |FROM events GROUP BY 1, 2, 3, 4""".stripMargin,
    "a2_traffic_bean_window" ->
      s"""WITH base AS (
         |  SELECT ${Oracle.fmtTs(Oracle.wsec(3600))} AS stt,
         |         ${Oracle.fmtTs(Oracle.wsec(3600) + " + 3600")} AS edt,
         |         ${Oracle.fmtDate(Oracle.wsec(3600))} AS cur_date,
         |         'v' || (CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 3) AS vc,
         |         event_type AS ch,
         |         'ar' || (user_id % 5) AS ar,
         |         user_id, "value",
         |         CASE WHEN CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 7 = 0
         |              THEN 1 ELSE 0 END AS is_start,
         |         strftime(ts, '%Y-%m-%d') AS event_day
         |  FROM events),
         |flagged AS (
         |  SELECT *, CASE WHEN event_day = min(event_day) OVER (PARTITION BY user_id)
         |                 THEN '1' ELSE '0' END AS is_new
         |  FROM base)
         |SELECT stt, edt, cur_date, vc, ch, ar, is_new,
         |       count(*) AS pv_ct,
         |       count(DISTINCT user_id) AS uv_ct,
         |       CAST(SUM(is_start) AS BIGINT) AS sv_ct,
         |       ${Oracle.moneySum("\"value\"")} AS dur_sum
         |FROM flagged GROUP BY 1, 2, 3, 4, 5, 6, 7""".stripMargin,
    "a5_global_window" ->
      s"""SELECT ${Oracle.fmtTs(Oracle.wsec(10))} AS stt,
         |       ${Oracle.fmtTs(Oracle.wsec(10) + " + 10")} AS edt,
         |       count(*) AS pv_ct,
         |       count(DISTINCT user_id) AS uv_ct,
         |       ${Oracle.moneySum("\"value\"")} AS value_sum
         |FROM events GROUP BY 1, 2""".stripMargin,
    "a4_province_order_window" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m-%d') AS cur_date,
         |       n_name AS province_name,
         |       count(DISTINCT o_orderkey) AS order_ct,
         |       ${Oracle.moneySum("o_totalprice")} AS order_amount
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1, 2""".stripMargin,
    "a3_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(SUM(${Oracle.money("l_quantity")}) AS DOUBLE) AS sum_qty,
         |       ${Oracle.moneySum("l_extendedprice")} AS sum_base_price,
         |       CAST(SUM(${Oracle.money("l_extendedprice")} * (1 - ${Oracle.money("l_discount")})) AS DOUBLE) AS sum_disc_price,
         |       CAST(SUM(${Oracle.money("l_extendedprice")} * (1 - ${Oracle.money("l_discount")}) * (1 + ${Oracle.money("l_tax")})) AS DOUBLE) AS sum_charge,
         |       count(*) AS count_order,
         |       CAST(SUM(${Oracle.money("l_quantity")}) AS DOUBLE) / count(*) AS avg_qty,
         |       ${Oracle.moneySum("l_extendedprice")} / count(*) AS avg_price
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY 1, 2""".stripMargin)
}
