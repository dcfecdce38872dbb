package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of related operators, each exposed as a named query over the
  * driver's parquet tables plus (where SQL-expressible) a DuckDB oracle.
  *
  * Contract (see the driver's Verify/Bench mains): every query takes the
  * active session and an sf directory (e.g. /root/testdata/sf0.01) and
  * returns a deterministic DataFrame whose column names match the oracle's
  * aliases exactly. Output columns avoid raw cross-row double sums —
  * amounts go through DECIMAL so results are bit-stable across engines
  * and across partition orders (summation-order independence matters on a
  * real cluster just as much as in the oracle compare).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Drop any memoized/persisted intermediates this module holds. The
    * bench harness calls this at family boundaries so cached blocks built
    * by one query family cannot distort the timings of the next; modules
    * without memos inherit the no-op. Correctness is unaffected — a later
    * call simply rebuilds the intermediate. */
  def release(): Unit = ()
}

/** Parquet table loader for the driver-generated testdata star schema. */
object Tables {
  import org.apache.spark.sql.functions.{col, from_utc_timestamp, lit, unix_micros}
  import org.apache.spark.sql.types.{LongType, TimestampType}

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The library-wide contract is `events.ts: LongType` epoch-nanos (see
    * functions.Fns). The generated parquet has carried that column as
    * either TIMESTAMP(NANOS) (read as LongType via the nanosAsLong flag)
    * or TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ); normalize the latter
    * here — one projection at the scan, inside codegen, zero shuffle —
    * so every consumer keeps exact integer epoch math. The micros→nanos
    * ×1000 stays exact in LongType until year ~2262, and the DuckDB
    * oracles' `epoch_us(ts)` equals `nsToUs(ts)` under both layouts.
    *
    * The NTZ column carries a zone-less wall-clock; the epoch contract
    * reads that wall-clock AS UTC (DuckDB's epoch_us does the same).
    * cast-to-TIMESTAMP interprets it in the SESSION zone, so undo that
    * zone's offset with from_utc_timestamp — an identity in the UTC
    * sessions every graft entry point builds (Verify.session), and the
    * correct shift for a library user's non-UTC session (exact up to
    * DST-ambiguous wall times, which an event-time column ordered by
    * arrival never dwells on). */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case _ =>
        val sessionTz =
          df.sparkSession.sessionState.conf.sessionLocalTimeZone
        df.withColumn("ts",
          unix_micros(from_utc_timestamp(
            col("ts").cast(TimestampType), sessionTz)) * lit(1000L))
    }
}
