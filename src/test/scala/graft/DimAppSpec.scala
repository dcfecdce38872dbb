package graft

import org.apache.spark.sql.functions._
import graft.streaming.DimApp

/** The composed DimApp twin: one envelope stream → config probe →
  * sinkColumns pruning → per-table merge stores, proven equal to the
  * k5_dim_merge_snapshot batch semantics per table. */
class DimAppSpec extends SparkSuite {

  test("dim app: per-table streamed store equals k5 batch semantics") {
    val src = java.nio.file.Files.createTempDirectory("dim_src").toString
    val store = java.nio.file.Files.createTempDirectory("dim_store").toString
    val ckp = java.nio.file.Files.createTempDirectory("dim_ckp").toString
    DimApp.envelopes(spark, sf).write.mode("overwrite")
      .parquet(s"$src/envelopes.parquet")

    val sq = DimApp.run(spark, src, store, ckp)
    sq.processAllAvailable()
    sq.stop()

    DimApp.configRows.foreach { cfg =>
      // maps don't support set ops — compare exploded entries
      val got = DimApp.store(spark, store, cfg.sink_table)
        .select(col("id"), col("seq"), explode(col("data")))
      val want = DimApp.batchSnapshot(spark, sf, cfg.sink_table)
        .select(col("id"), col("seq"), explode(col("data")))
      assert(got.count() > 0)
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0,
        s"store mismatch for ${cfg.sink_table}")
    }

    val cust = DimApp.store(spark, store, "dim_customer_info")
    // deletes dropped the %13 keys
    assert(cust.filter(pmod(col("id").cast("long"), lit(13)) === 0)
      .count() == 0)
    // updates won: every remaining %7 key's name carries the _u suffix
    val updated = cust.filter(pmod(col("id").cast("long"), lit(7)) === 0)
      .select(explode(col("data"))).filter(col("key") === "name")
    assert(updated.count() > 0 &&
      updated.filter(!col("value").endsWith("_u")).count() == 0)
    // sinkColumns pruning: acctbal never reached the store
    assert(cust.select(explode(col("data")))
      .filter(col("key") === "acctbal").count() == 0)
    // the unconfigured fact table produced no store at all
    assert(!new java.io.File(s"$store/order_info").exists() &&
      !new java.io.File(s"$store/dim_order_info").exists())
  }
}
