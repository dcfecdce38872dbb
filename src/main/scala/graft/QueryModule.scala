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
  import org.apache.spark.sql.functions.{col, lit, unix_micros}
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
    * oracles' `epoch_us(ts)` equals `nsToUs(ts)` under both layouts. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn(
        "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
}
