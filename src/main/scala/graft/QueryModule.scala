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
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
