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

  test("dim app SCD2 mode: streamed history equals the k6 batch " +
      "construction and audits clean") {
    val src = java.nio.file.Files.createTempDirectory("dim2_src").toString
    val store = java.nio.file.Files.createTempDirectory("dim2_store").toString
    val ckp = java.nio.file.Files.createTempDirectory("dim2_ckp").toString
    // shard the op log by sequence epoch (insert@1000 / update@2000 /
    // delete@3000) into separate files with strictly increasing mtimes:
    // with maxFilesPerTrigger=1 each file is its own ordered micro-batch
    // — the per-key seq-nondecreasing arrival the SCD2 sink's close-and-
    // insert contract assumes (a per-key-ordered CDC topic)
    val envs = DimApp.envelopes(spark, sf)
      .select(col("envelope"),
        get_json_object(col("envelope"), "$.ts").cast("long").as("ts"))
    Seq(1000L, 2000L, 3000L).zipWithIndex.foreach { case (ts, i) =>
      val f = s"$src/envelopes_$i.parquet"
      envs.filter(col("ts") === ts).select(col("envelope"))
        .repartition(1).write.mode("overwrite").parquet(f)
      val dir = new java.io.File(f)
      (dir +: Option(dir.listFiles()).getOrElse(Array.empty).toSeq)
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val sq = DimApp.runScd2(spark, src, store, ckp)
    sq.processAllAvailable()
    sq.stop()
    // incrementality was real: one commit per shard file
    val batches = new java.io.File(s"$ckp/commits")
      .listFiles().count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"expected >=3 ordered micro-batches, got $batches")

    DimApp.configRows.foreach { cfg =>
      val got = DimApp.scd2Store(spark, store, cfg.sink_table)
        .select(col("id"), col("version"), col("op"),
          col("valid_from_seq"), col("valid_to_seq"), col("is_current"),
          explode(col("data")))
      val want = DimApp.batchScd2History(spark, sf, cfg.sink_table)
        .select(col("id"), col("version"), col("op"),
          col("valid_from_seq"), col("valid_to_seq"), col("is_current"),
          explode(col("data")))
      assert(got.count() > 0)
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0,
        s"streamed SCD2 history != batch construction for ${cfg.sink_table}")
    }

    // the maintained store satisfies the k9 audit contract as-is
    val hist = DimApp.scd2Store(spark, store, "dim_customer_info")
    val audit = graft.api.Graft.scd2Audit(hist).head()
    assert(audit.getAs[Boolean]("scd2_ok"),
      s"streamed SCD2 store failed the k9 audit: $audit")
    // type-2 vs type-1: deleted keys KEEP their closed history rows
    assert(hist.filter(pmod(col("id").cast("long"), lit(13)) === 0)
      .count() > 0, "deletes must close, not erase, history")
    assert(hist.filter(pmod(col("id").cast("long"), lit(13)) === 0 &&
      col("is_current")).count() == 0,
      "no deleted key may hold a current version")

    // in-order replay: every quarantine ledger version is empty
    DimApp.configRows.foreach { cfg =>
      assert(DimApp.scd2Quarantine(spark, store, cfg.sink_table)
        .count() == 0, s"in-order replay quarantined ops for " +
          cfg.sink_table)
    }
  }

  test("dim app SCD2 mode: OUT-OF-ORDER arrivals are quarantined, the " +
      "store stays audit-clean, and the repair rebuilds the in-order twin") {
    val src = java.nio.file.Files.createTempDirectory("dim3_src").toString
    val store = java.nio.file.Files.createTempDirectory("dim3_store").toString
    val ckp = java.nio.file.Files.createTempDirectory("dim3_ckp").toString
    // shard 0 carries inserts@1000 AND deletes@3000; shard 1 delivers
    // the updates@2000 LATE — the cross-batch disorder a multi-
    // partition CDC topic produces. Keys with both an update (%7) and
    // a delete (%13) now receive an op below their open (delete)
    // version's valid_from_seq; keys with only the update are merely
    // late, not out of order, and must merge normally.
    val envs = DimApp.envelopes(spark, sf)
      .select(col("envelope"),
        get_json_object(col("envelope"), "$.ts").cast("long").as("ts"))
    Seq(Seq(1000L, 3000L), Seq(2000L)).zipWithIndex.foreach {
      case (tss, i) =>
        val f = s"$src/envelopes_$i.parquet"
        envs.filter(col("ts").isin(tss: _*)).select(col("envelope"))
          .repartition(1).write.mode("overwrite").parquet(f)
        val dir = new java.io.File(f)
        (dir +: Option(dir.listFiles()).getOrElse(Array.empty).toSeq)
          .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val sq = DimApp.runScd2(spark, src, store, ckp)
    sq.processAllAvailable()
    sq.stop()

    val table = "dim_customer_info"
    val hist = DimApp.scd2Store(spark, store, table)
    val quarantine = DimApp.scd2Quarantine(spark, store, table)

    // 1. the violators (update@2000 onto keys deleted@3000 = %91 keys)
    // are quarantined, with the open seq they violated
    assert(quarantine.count() > 0, "disorder fixture quarantined nothing")
    assert(quarantine.filter(col("seq") =!= 2000L ||
      col("open_from_seq") =!= 3000L ||
      pmod(col("id").cast("long"), lit(91)) =!= 0).count() == 0,
      "unexpected quarantine membership")
    // merely-LATE ops (update@2000 on a never-deleted key) merged
    val lateButOrdered = hist.filter(
      pmod(col("id").cast("long"), lit(7)) === 0 &&
        pmod(col("id").cast("long"), lit(13)) =!= 0 &&
        col("valid_from_seq") === 2000L)
    assert(lateButOrdered.count() > 0,
      "late-but-ordered updates must merge, not quarantine")

    // 2. the maintained store is still k9-audit-clean
    val audit = graft.api.Graft.scd2Audit(hist).head()
    assert(audit.getAs[Boolean]("scd2_ok"),
      s"out-of-order arrival corrupted the store: $audit")
    // and the wrong chain was NOT built: no %91 key carries the update
    assert(hist.filter(pmod(col("id").cast("long"), lit(91)) === 0 &&
      col("valid_from_seq") === 2000L).count() == 0,
      "a quarantined op leaked into the chain")

    // 3. repair: store ops + quarantined ops rebuild the exact chain
    // an in-order replay (the k6 batch construction) produces
    val got = DimApp.scd2Repaired(spark, store, table)
      .select(col("id"), col("version"), col("op"),
        col("valid_from_seq"), col("valid_to_seq"), col("is_current"),
        explode(col("data")))
    val want = DimApp.batchScd2History(spark, sf, table)
      .select(col("id"), col("version"), col("op"),
        col("valid_from_seq"), col("valid_to_seq"), col("is_current"),
        explode(col("data")))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "repaired history != in-order twin")

    // 4. COMMIT the repair: the maintained store becomes the in-order
    // twin, the quarantine empties, the audit stays clean
    val qSnapshot = quarantine.collect()
    val committed = DimApp.scd2CommitRepaired(spark, store, table)
    assert(committed.exists(_.contains("r1")),
      s"repair must commit as a v<B>r<k> version, got $committed")
    val afterStore = DimApp.scd2Store(spark, store, table)
      .select(col("id"), col("version"), col("op"),
        col("valid_from_seq"), col("valid_to_seq"), col("is_current"),
        explode(col("data")))
    assert(afterStore.exceptAll(want).count() == 0 &&
      want.exceptAll(afterStore).count() == 0,
      "committed store != in-order twin")
    assert(DimApp.scd2Quarantine(spark, store, table).count() == 0,
      "commit must clear the quarantine")
    assert(graft.api.Graft.scd2Audit(
        DimApp.scd2Store(spark, store, table)).head()
      .getAs[Boolean]("scd2_ok"), "committed repair failed the k9 audit")

    // 5. crash replay: simulate a crash BETWEEN the repair write and
    // the quarantine clear by re-committing the old quarantine ops,
    // then re-run — the ops are already in the chain, so the re-run
    // must skip the write (None), clear again, and leave the store
    // bit-identical (a quarantined op folds exactly once, ever)
    spark.createDataFrame(
        spark.sparkContext.parallelize(qSnapshot.toIndexedSeq),
        quarantine.schema)
      .write.mode("overwrite").parquet(s"$store/$table/__quarantine/v99")
    assert(DimApp.scd2CommitRepaired(spark, store, table).isEmpty,
      "replayed commit must not write a second repair version")
    assert(DimApp.scd2Quarantine(spark, store, table).count() == 0)
    val afterReplay = DimApp.scd2Store(spark, store, table)
      .select(col("id"), col("version"), col("op"),
        col("valid_from_seq"), col("valid_to_seq"), col("is_current"),
        explode(col("data")))
    assert(afterReplay.exceptAll(want).count() == 0 &&
      want.exceptAll(afterReplay).count() == 0,
      "replayed commit changed the store")
  }
}
