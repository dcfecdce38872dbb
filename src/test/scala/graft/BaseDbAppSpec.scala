package graft

import org.apache.spark.sql.functions._
import graft.streaming.BaseDbApp

/** The composed DwdBaseDb twin: one envelope stream → compound
  * (table,type) config probe → sinkColumns pruning + ts stamping →
  * sink_table-partitioned dynamic routing, proven equal to the batch
  * transform over the same envelope log. */
class BaseDbAppSpec extends SparkSuite {

  test("base-db app: streamed routed store equals the batch twin") {
    val src = java.nio.file.Files.createTempDirectory("bdb_src").toString
    val store = java.nio.file.Files.createTempDirectory("bdb_store").toString
    val ckp = java.nio.file.Files.createTempDirectory("bdb_ckp").toString
    BaseDbApp.envelopes(spark, sf).write.mode("overwrite")
      .parquet(s"$src/envelopes.parquet")

    val sq = BaseDbApp.run(spark, src, store, ckp)
    sq.processAllAvailable()
    sq.stop()

    // maps don't support set ops — compare exploded entries
    val got = BaseDbApp.store(spark, store)
      .select(col("sink_table"), col("data")("id").as("id"),
        explode(col("data")))
    val want = BaseDbApp.routed(spark, BaseDbApp.envelopes(spark, sf))
      .select(col("sink_table"), col("data")("id").as("id"),
        explode(col("data")))
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0, "routed store != batch twin")
  }

  test("base-db app: config op-log replay and pruning semantics") {
    val routed = BaseDbApp.routed(spark, BaseDbApp.envelopes(spark, sf))
    val tables = routed.select(col("sink_table")).distinct()
      .collect().map(_.getString(0)).toSet
    // the d retired the cart route; the three live routes all fired
    assert(tables == Set("dwd_interaction_favor_add",
      "dwd_tool_coupon_get", "dwd_tool_coupon_use"))
    // the u narrowed favor's sinkColumns: create_time (and the never-
    // configured is_cancel) must not reach the payload; ts is stamped
    val favorKeys = routed
      .filter(col("sink_table") === "dwd_interaction_favor_add")
      .select(explode(map_keys(col("data"))).as("k"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(favorKeys == Set("id", "user_id", "sku_id", "ts"))
    // bootstrap-insert replays were dropped before the probe: favor row
    // count equals the insert slice exactly (mod-3 keys, no mod-9 extra)
    val favorCt = routed
      .filter(col("sink_table") === "dwd_interaction_favor_add").count()
    val insertCt = Tables(spark, sf, "orders")
      .filter(pmod(col("o_orderkey"), lit(3)) === 0).count()
    assert(favorCt == insertCt)
  }
}
