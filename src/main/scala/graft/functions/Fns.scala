package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared scalar building blocks (reference: DateFormatUtil.java:16-65,
  * DwsTradeSkuOrderWindow.java:235 for the s-vs-ms normalization problem;
  * here the events table carries epoch-NANOS longs because Spark reads
  * parquet TIMESTAMP(NANOS) via spark.sql.legacy.parquet.nanosAsLong).
  *
  * Everything here is Column-composable (whole-stage-codegen friendly) and
  * engine-parity-safe: integer math instead of double division, DECIMAL
  * quantization before cross-row sums so results do not depend on
  * partition/summation order — a correctness property at 1000 executors,
  * not just an oracle-compare trick.
  */
object Fns {

  /** Exact floor-division of a non-negative LongType column. `c / n` on
    * longs is double division in Spark SQL and loses precision above 2^53
    * (epoch-nanos ≈ 1.7e18); the `div` operator (IntegralDivide) stays in
    * long arithmetic — exact for any magnitude. */
  def divFloor(c: Column, n: Long): Column =
    call_function("div", c, lit(n)).cast(LongType)

  /** Epoch-nanos → epoch-seconds. */
  def nsToSec(ns: Column): Column = divFloor(ns, 1000000000L)

  /** Epoch-nanos → epoch-micros (DuckDB timestamp resolution; used when a
    * comparison must agree with microsecond-truncated semantics). */
  def nsToUs(ns: Column): Column = divFloor(ns, 1000L)

  /** Epoch-nanos → epoch-millis (the reference's log `ts` unit). */
  def nsToMs(ns: Column): Column = divFloor(ns, 1000000L)

  /** Tumbling event-time window start, in epoch seconds, aligned to the
    * epoch — identical semantics to Flink's TumblingEventTimeWindows /
    * Spark's window() (left-closed right-open, epoch-aligned; reference
    * DwsTrafficVcChArIsNewPageViewWindow.java:138-145). Computed with
    * integer math so it is exact for nano timestamps.
    */
  def windowStartSec(ns: Column, widthSec: Long): Column =
    divFloor(ns, widthSec * 1000000000L) * widthSec

  /** Window-bound stamping, reference DateFormatUtil.java:16-18 ("stt"
    * start / "edt" end / "cur_date" partition column of every DWS bean). */
  def stt(wstartSec: Column): Column =
    date_format(timestamp_seconds(wstartSec), "yyyy-MM-dd HH:mm:ss")
  def edt(wstartSec: Column, widthSec: Long): Column =
    date_format(timestamp_seconds(wstartSec + widthSec), "yyyy-MM-dd HH:mm:ss")
  def curDate(sec: Column): Column =
    date_format(timestamp_seconds(sec), "yyyy-MM-dd")

  /** DECIMAL(16,2)-style money, reference DwdTradeOrderDetail.java:40-41 /
    * bean/TradeSkuOrderBean.java:48-56 (BigDecimal end to end). Decimal
    * sums are exact and associative — summation order (partitioning) does
    * not change the result, unlike double sums. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact, order-independent sum of a money column, surfaced as DOUBLE so
    * output schemas stay decimal-scale-free. */
  def moneySum(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Quantize a computed double (e.g. a vector norm) to 6 decimals via
    * DECIMAL so it can be summed across rows deterministically. */
  def quant6(c: Column): Column = c.cast(DecimalType(28, 6))

  /** First 4 md5 hex digits of a (stringified) column as a BIGINT in
    * [0, 65536) — the deterministic-uniform hash both engines replay
    * identically (twin: [[Oracle.hex4]]). Codegen'd builtins only. */
  def hex4(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 4), 16, 10).cast(LongType)
}

/** DuckDB-side expression fragments mirroring [[Fns]] exactly. The driver
  * runs oracle SQL in DuckDB over the same parquet files; these helpers
  * keep the two implementations structurally parallel so parity is by
  * construction, not by luck. DuckDB reads the events.ts nano timestamps
  * as microsecond TIMESTAMP; epoch_us(ts)//k is the integer-math twin of
  * [[Fns.divFloor]].
  */
object Oracle {
  /** Epoch seconds of a (nano-origin) timestamp column. */
  def sec(ts: String = "ts"): String = s"(epoch_us($ts) // 1000000)"

  /** Tumbling window start in epoch seconds, width in seconds. */
  def wsec(widthSec: Long, ts: String = "ts"): String =
    s"((epoch_us($ts) // ${widthSec * 1000000L}) * $widthSec)"

  def fmtTs(secExpr: String): String =
    s"strftime(make_timestamp(CAST(($secExpr) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S')"
  def fmtDate(secExpr: String): String =
    s"strftime(make_timestamp(CAST(($secExpr) AS BIGINT) * 1000000), '%Y-%m-%d')"

  def money(e: String): String = s"CAST($e AS DECIMAL(18,2))"
  def moneySum(e: String): String = s"CAST(SUM(${money(e)}) AS DOUBLE)"

  /** First 4 md5 hex digits of an expression as a BIGINT in [0, 65536) —
    * DuckDB has no base-conversion builtin, so the digits are folded by
    * hand. Twin of [[Fns.hex4]]; the shared deterministic-uniform hash
    * for damage injection / sampling decisions both engines must replay
    * identically. */
  def hex4(x: String): String =
    s"""CAST(list_aggregate(list_transform(range(1, 5),
       |      i -> (strpos('0123456789abcdef', substr(md5($x), i, 1)) - 1)
       |           * (CAST(1 AS BIGINT) << (4 * (4 - i)))), 'sum') AS BIGINT)""".stripMargin
}
