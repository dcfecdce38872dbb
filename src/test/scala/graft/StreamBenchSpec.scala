package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the committed streaming-path artifacts
  * (STREAM_BENCH.json + STATE_LEDGER.tsv, regenerated per round by
  * `sbt "runMain graft.StreamBench"`) — the streaming siblings of
  * PerfSpec's SCALE_LEDGER guard. Pure file checks (the bench itself
  * is a ~5-minute two-scale replay, far too heavy per test run); like
  * the scale ledger, every verdict is RE-DERIVED from the recorded
  * numbers, never trusted from a stored column. */
class StreamBenchSpec extends AnyFunSuite {

  /** All 12 composed apps the bench must cover (the reference's
    * always-on fleet, BaseApp.java:22-65). */
  private val apps = Seq("dim", "basedb", "baselog", "province_order",
    "keyword", "sku_order", "traffic_channel", "user_login", "cart_add",
    "home_detail", "page_view", "daily_first")

  /** The five windowed DWS apps under the serving-freshness contract. */
  private val windowed = Seq("traffic_channel", "user_login", "cart_add",
    "home_detail", "page_view")

  private lazy val bench: String = java.nio.file.Files.readString(
    java.nio.file.Paths.get("STREAM_BENCH.json"))

  private def appField(app: String, field: String): Option[String] = {
    // minimal extraction (no JSON lib on the test classpath): the app
    // objects are flat, so a regex over `"app":{...}` is exact
    val obj = s""""$app":\\{([^}]*)\\}""".r
      .findFirstMatchIn(bench).map(_.group(1))
    obj.flatMap(o => s""""$field":([^,}]+)""".r
      .findFirstMatchIn(o).map(_.group(1)))
  }

  test("STREAM_BENCH.json covers all 12 apps with a real multi-batch " +
      "replay and a throughput floor") {
    apps.foreach { a =>
      val rows = appField(a, "input_rows").map(_.toLong)
      assert(rows.exists(_ > 0), s"$a missing or processed nothing " +
        "(run sbt 'runMain graft.StreamBench')")
      val batches = appField(a, "batches").map(_.toLong)
      assert(batches.exists(_ >= 2),
        s"$a replay was not incremental: batches=$batches")
      // the floor is deliberately an order of magnitude under the
      // recorded numbers (sf0.01: slowest app ~500 rows/s) — it exists
      // to catch collapse-class regressions (state-store churn,
      // per-batch replanning explosions), not machine variance
      val rps = appField(a, "rows_per_sec").map(_.toDouble)
      assert(rps.exists(_ >= 50.0),
        s"$a throughput collapsed: rows_per_sec=$rps")
    }
  }

  test("serving freshness holds in the recorded replay: every windowed " +
      "app's max delay is zero batches") {
    windowed.foreach { a =>
      val d = appField(a, "freshness_max_delay")
      assert(d.contains("0"),
        s"$a freshness regressed: max delay $d batches (a window " +
          "became visible later than the first batch its watermark " +
          "allowed)")
    }
  }

  test("the concurrent 12-app topology pipelines instead of " +
      "serializing") {
    val topo = """"topology":\{([^}]*)\}""".r
      .findFirstMatchIn(bench).map(_.group(1))
    assert(topo.nonEmpty, "no topology section — rerun StreamBench")
    def field(f: String): Double = s""""$f":([^,}]+)""".r
      .findFirstMatchIn(topo.get).map(_.group(1).toDouble).get
    val wall = field("wall_sec")
    val seq = field("sequential_wall_sec")
    assert(field("input_rows") > 0)
    // generous bound: 12 concurrent apps must beat 90% of the
    // sequential sum — catches scheduler serialization collapse, not
    // machine variance (the recorded run pipelines ~1.4x: micro-batch
    // barriers bound the overlap on 16 local threads)
    assert(wall < 0.9 * seq,
      f"topology wall $wall%.1f s vs sequential sum $seq%.1f s — " +
        "the fleet is serializing")
  }

  test("cross-scale STATE growth stays ~linear (STATE_LEDGER.tsv)") {
    val rows = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("STATE_LEDGER.tsv"),
        java.nio.charset.StandardCharsets.UTF_8)
      .asScala.filterNot(l => l.startsWith("#") || l.isBlank)
      .map { l =>
        val a = l.split("\t")
        a(0) -> ((a(1).toLong, a(2).toLong))
      }.toMap
    val missing = apps.filterNot(rows.contains)
    assert(missing.isEmpty,
      s"apps without a state-ledger row: $missing")
    val blown = rows.toSeq.sorted.collect {
      case (n, (small, big)) if StreamBench.flaggedState(small, big) =>
        f"$n: $small%d → $big%d state rows " +
          f"(${big.toDouble / math.max(1L, small)}%.1f×) across a " +
          f"${StreamBench.inputRatio.toInt}× input step"
    }
    assert(blown.isEmpty,
      s"superlinear state growth:\n${blown.mkString("\n")}")
  }
}
