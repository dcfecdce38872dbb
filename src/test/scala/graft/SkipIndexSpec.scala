package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.SkipIndex

/** Zone-map file skipping (plans/SkipIndex.scala): pruning must FIRE
  * where the stats prove emptiness (the scan's file listing shrinks at
  * planning time), stay bit-equal to the unpruned plan, and fall
  * through — keep every file — on stale stores, unknown predicate
  * shapes, and any atom the stats can't refute. */
class SkipIndexSpec extends SparkSuite {

  // ONE copy of the executed-plan file-metric helpers (AQE unwrapping
  // included) — three tests read the physical scan's numFiles
  private def flatPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    p +: (p match {
      case q: QueryStageExec => flatPlan(q.plan)
      case _ => p.children.flatMap(flatPlan)
    })
  }

  private def physFiles(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    flatPlan(finalPlan).collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.sum
  }

  private def scanFileCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.length
      }
    }.sum

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  test("x23: the box scan prunes files at planning time, bit-equal " +
      "to the unpruned plan") {
    val store = s"${operators.ScalePatterns.skipStoreDir(spark, sf)}/orders_z"
    def rawQ = spark.read.parquet(store)
      .filter(col("o_custkey") <= 75 &&
        col("o_orderdate") >= "1995-01-01" &&
        col("o_orderdate") <= "1995-12-31")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_ct"))
    val nav = SkipIndex.navigate(rawQ)
    val total = scanFileCount(rawQ)
    val kept = scanFileCount(nav)
    assert(kept < total,
      s"zone maps pruned nothing: $kept of $total files kept")
    assert(kept > 0, "pruning removed every file for a non-empty box")
    // results identical to the unpruned plan
    assert(nav.sort("o_orderpriority").collect().toSeq ==
      rawQ.sort("o_orderpriority").collect().toSeq)
    // the physical scan actually reads the pruned listing
    val numFiles = physFiles(nav)
    assert(numFiles == kept.toLong,
      s"physical scan read $numFiles files, planning kept $kept")
    // the suite entry goes through navigate too
    val x23 = q("x23_skipscan_prune")
    assert(scanFileCount(x23) < total,
      "x23 suite entry did not prune")
  }

  test("staleness fence: a store change after registration keeps the " +
      "scan unpruned (both directions)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipidx_fence_").toString
    import spark.implicits._
    try {
      (1 to 100).map(i => (i.toLong, s"r$i"))
        .toDF("k", "s").repartitionByRange(4, col("k"))
        .write.mode("overwrite").parquet(s"$root/t")
      SkipIndex.register(spark, "fence_spec", s"$root/t", Seq("k"))
      def q0 = spark.read.parquet(s"$root/t").filter(col("k") <= 10L)
      val before = SkipIndex.navigate(q0)
      assert(scanFileCount(before) < 4, "expected pruning while fresh")
      // a plan PINNED before the change keeps serving its own listing —
      // and a fresh plan over the CHANGED store must not prune
      (101 to 110).map(i => (i.toLong, s"r$i")).toDF("k", "s")
        .write.mode("append").parquet(s"$root/t")
      val after = SkipIndex.navigate(
        spark.read.parquet(s"$root/t").filter(col("k") <= 10L))
      val files = scanFileCount(after)
      assert(files >= 5,
        s"stale index still pruned: $files files in the scan")
      assert(after.count() == 10L)
    } finally {
      SkipIndex.unregister(spark, "fence_spec")
      rm(new java.io.File(root))
    }
  }

  test("three-valued atoms: unknown shapes and OR branches keep files " +
      "unless EVERY branch refutes; null stats prune soundly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipidx_atoms_").toString
    import spark.implicits._
    try {
      // 4 range files over k = 1..100; file 1 = [1,25], … file 4 =
      // [76,100]; v is NULL exactly on k <= 25 (file 1 all-null)
      (1 to 100).map(i =>
        (i.toLong, if (i <= 25) None else Some(i.toLong)))
        .toDF("k", "v").repartitionByRange(4, col("k"))
        .write.mode("overwrite").parquet(s"$root/t")
      SkipIndex.register(spark, "atoms_spec", s"$root/t", Seq("k", "v"))
      def base = spark.read.parquet(s"$root/t")
      val all = scanFileCount(base.filter(col("k") > -1L))

      // OR: both branches must refute for a file to drop
      val or2 = SkipIndex.navigate(
        base.filter(col("k") <= 10L || col("k") > 90L))
      assert(scanFileCount(or2) == 2,
        s"OR should keep exactly the two edge files")
      assert(or2.count() == 20L)

      // unknown shape (function of the stats column): keep everything
      val unk = SkipIndex.navigate(
        base.filter(col("k") % 2 === 0L && col("k") <= 10L))
      // the k<=10 conjunct still prunes down to file 1 — the modulo
      // atom alone must not block the provable conjunct
      assert(scanFileCount(unk) == 1)
      assert(unk.count() == 5L)

      // IsNull prunes all-non-null files; equality null-rejects the
      // all-null file
      val nulls = SkipIndex.navigate(base.filter(col("v").isNull))
      assert(scanFileCount(nulls) == 1, "only file 1 has nulls")
      assert(nulls.count() == 25L)
      val eq = SkipIndex.navigate(base.filter(col("v") === 30L))
      assert(scanFileCount(eq) == 1, "equality must skip the all-null file")
      assert(eq.count() == 1L)

      // IN lists: any member inside the extent keeps the file
      val in2 = SkipIndex.navigate(
        base.filter(col("k").isin(5L, 99L)))
      assert(scanFileCount(in2) == 2)
      assert(in2.count() == 2L)
      assert(all == 4)
    } finally {
      SkipIndex.unregister(spark, "atoms_spec")
      rm(new java.io.File(root))
    }
  }

  test("refresh: an append re-arms pruning by scanning ONLY the new " +
      "files; removed files drop") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipidx_refresh_").toString
    import spark.implicits._
    try {
      (1 to 100).map(i => (i.toLong, s"r$i"))
        .toDF("k", "s").repartitionByRange(4, col("k"))
        .write.mode("overwrite").parquet(s"$root/t")
      SkipIndex.register(spark, "refresh_spec", s"$root/t", Seq("k"))
      def q0 = SkipIndex.navigate(
        spark.read.parquet(s"$root/t").filter(col("k") <= 10L))
      assert(scanFileCount(q0) < 4)
      // append a file OUTSIDE the predicate range: stale → unpruned
      Seq((500L, "r500")).toDF("k", "s")
        .write.mode("append").parquet(s"$root/t")
      assert(scanFileCount(q0) >= 5, "stale index must not prune")
      // refresh diffs the listing and stats-scans just the new file
      SkipIndex.refresh(spark, "refresh_spec")
      val after = q0
      assert(scanFileCount(after) < 5,
        s"refresh did not re-arm pruning: ${scanFileCount(after)}")
      assert(after.count() == 10L)
      // the new file's OWN stats are live: a predicate that only it
      // satisfies keeps exactly one file
      val hi = SkipIndex.navigate(
        spark.read.parquet(s"$root/t").filter(col("k") >= 200L))
      assert(scanFileCount(hi) == 1)
      assert(hi.count() == 1L)
      // a removed file drops from the index on the next refresh
      val gone = new java.io.File(s"$root/t").listFiles()
        .filter(_.getName.endsWith(".parquet")).maxBy(_.length())
      gone.delete()
      SkipIndex.refresh(spark, "refresh_spec")
      val postDelete = SkipIndex.navigate(
        spark.read.parquet(s"$root/t").filter(col("k") > -1L))
      assert(postDelete.count() ==
        spark.read.parquet(s"$root/t").count())
    } finally {
      SkipIndex.unregister(spark, "refresh_spec")
      rm(new java.io.File(root))
    }
  }

  test("partitioned refresh: an append to ONE partition re-arms " +
      "pruning; the basePath leaf read recovers partition columns") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipidx_partrefresh_").toString
    import spark.implicits._
    try {
      // two partitions × two range files each on k
      (1 to 100).map(i => (i.toLong, s"p${(i - 1) / 50}"))
        .toDF("k", "part").repartitionByRange(4, col("part"), col("k"))
        .write.partitionBy("part").mode("overwrite").parquet(s"$root/p")
      SkipIndex.register(spark, "part_refresh_spec", s"$root/p", Seq("k"))
      def low = SkipIndex.navigate(
        spark.read.parquet(s"$root/p").filter(col("k") <= 10L))
      val total = scanFileCount(
        spark.read.parquet(s"$root/p").filter(col("k") > -1L))
      assert(scanFileCount(low) < total, "expected pruning while fresh")
      // append into partition p0 only: stale → unpruned, refresh →
      // stats-scans just the new leaf (with its partition value back)
      Seq((500L, "p0")).toDF("k", "part")
        .write.partitionBy("part").mode("append").parquet(s"$root/p")
      assert(scanFileCount(low) == total + 1,
        "stale partitioned index must not prune")
      SkipIndex.refresh(spark, "part_refresh_spec")
      assert(scanFileCount(low) < total + 1,
        s"partitioned refresh did not re-arm: ${scanFileCount(low)}")
      assert(low.count() == 10L)
      // the appended leaf's own stats are live (only it holds k=500),
      // and the recovered partition column still filters correctly
      val hi = SkipIndex.navigate(
        spark.read.parquet(s"$root/p").filter(col("k") >= 200L))
      assert(scanFileCount(hi) == 1)
      assert(hi.count() == 1L)
      assert(spark.read.parquet(s"$root/p")
        .filter(col("part") === "p0" && col("k") >= 200L).count() == 1L)
    } finally {
      SkipIndex.unregister(spark, "part_refresh_spec")
      rm(new java.io.File(root))
    }
  }

  test("x25: partition pruning and zone maps COMPOSE — the physical " +
      "scan reads only in-quarter files that intersect the custkey box") {
    val store =
      s"${operators.ScalePatterns.partSkipStoreDir(spark, sf)}/orders_part"
    val monthBox = col("o_month") >= "1995-01" && col("o_month") <= "1995-03"
    val total = physFiles(
      spark.read.parquet(store).groupBy().count())
    // partition pruning alone: only the quarter's directories
    val partOnly = physFiles(
      spark.read.parquet(store).filter(monthBox).groupBy().count())
    assert(partOnly < total,
      s"partition pruning dead: $partOnly of $total files")
    // both prunings: zone maps drop custkey-missing files INSIDE the
    // surviving partitions
    val both = physFiles(SkipIndex.navigate(
      spark.read.parquet(store)
        .filter(monthBox && col("o_custkey") <= 75)
        .groupBy().count()))
    assert(both < partOnly,
      s"zone maps added nothing: $both vs partition-only $partOnly")
    assert(both > 0)
    // bit-equal to the unpruned raw plan through the suite entry
    val x25 = q("x25_part_skipscan")
    val raw = spark.read.parquet(store)
      .filter(monthBox && col("o_custkey") <= 75)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_ct"))
      .sort("o_orderpriority")
    assert(x25.select("o_orderpriority", "order_ct").collect().toSeq ==
      raw.collect().toSeq)
  }

  test("x28: zone maps compose with TWO-LEVEL partition pruning, and " +
      "refresh-after-append re-arms on the nested layout") {
    val store = s"${operators.ScalePatterns
      .nestedSkipStoreDir(spark, sf)}/orders_nested"
    val yearBox = col("o_year") === "1995"
    val monthBox = col("o_mm") >= "01" && col("o_mm") <= "03"
    val total = physFiles(spark.read.parquet(store).groupBy().count())
    // nested partition pruning alone: only 1995's Q1 leaf dirs
    val partOnly = physFiles(spark.read.parquet(store)
      .filter(yearBox && monthBox).groupBy().count())
    assert(partOnly < total,
      s"two-level partition pruning dead: $partOnly of $total files")
    // both prunings: zone maps drop custkey-missing files INSIDE the
    // surviving (year, month) leaves
    def boxQ = spark.read.parquet(store)
      .filter(yearBox && monthBox && col("o_custkey") <= 75)
      .groupBy().count()
    val both = physFiles(SkipIndex.navigate(boxQ))
    assert(both < partOnly,
      s"zone maps added nothing on the nested store: $both vs $partOnly")
    assert(both > 0)
    // bit-equal through the suite entry
    val x28 = q("x28_nested_skipscan")
    val raw = spark.read.parquet(store)
      .filter(yearBox && monthBox && col("o_custkey") <= 75)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_ct"))
      .sort("o_orderpriority")
    assert(x28.select("o_orderpriority", "order_ct").collect().toSeq ==
      raw.collect().toSeq)
    // append one file into an existing leaf of a PRIVATE copy: the
    // fence kills pruning (full listing served — sound), then
    // refresh() stats-scans only the new file and pruning re-arms
    // over the grown nested store
    val priv = java.nio.file.Files
      .createTempDirectory("x28_refresh_").toString + "/orders_nested"
    try {
      val base = spark.read.parquet(store)
      base.write.partitionBy("o_year", "o_mm").parquet(priv)
      SkipIndex.register(spark, "x28_refresh", priv, Seq("o_custkey"))
      def privQ = spark.read.parquet(priv)
        .filter(yearBox && monthBox && col("o_custkey") <= 75)
        .groupBy().count()
      assert(physFiles(SkipIndex.navigate(privQ)) < physFiles(privQ))
      spark.read.parquet(priv).limit(1)
        .write.mode("append").partitionBy("o_year", "o_mm").parquet(priv)
      val grownPartOnly = physFiles(spark.read.parquet(priv)
        .filter(yearBox && monthBox).groupBy().count())
      val stale = physFiles(SkipIndex.navigate(privQ))
      assert(stale == grownPartOnly,
        s"stale nested index must not prune: $stale vs $grownPartOnly")
      SkipIndex.refresh(spark, "x28_refresh")
      val rearmed = physFiles(SkipIndex.navigate(privQ))
      assert(rearmed < grownPartOnly,
        s"refresh did not re-arm nested pruning: $rearmed")
      assert(SkipIndex.navigate(privQ).head.getLong(0) ==
        privQ.head.getLong(0))
    } finally {
      SkipIndex.unregister(spark, "x28_refresh")
      rm(new java.io.File(priv).getParentFile)
    }
  }

  test("x27: the serving stack composes — navigation re-roots onto the " +
      "clustered summary AND zone maps prune the summary's own files") {
    val sumDir = s"${operators.ScalePatterns.navMonthDir(spark, sf)}/v0"
    val x27 = q("x27_summary_skipscan")
    // navigation fired: the plan reads the summary, never the facts
    val leaves = x27.queryExecution.optimizedPlan.collectLeaves()
      .flatMap {
        case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
        case _ => Nil
      }.toSet
    assert(leaves.exists(_.startsWith(s"file:$sumDir")),
      s"x27 did not navigate onto the month summary: $leaves")
    assert(!leaves.contains(s"file:$sf/orders.parquet"),
      s"x27 still scans the fact table: $leaves")
    // skipping fired INSIDE the summary: the clustered layout lets the
    // half-year filter prune summary files at planning time
    val total = physFiles(
      spark.read.parquet(sumDir).groupBy().count())
    val read = physFiles(x27)
    assert(read < total,
      s"summary-side skipping dead: read $read of $total summary files")
    assert(read > 0)
    // and the composed result equals the unfenced raw aggregation
    val month = substring(
      date_format(col("o_orderdate"), "yyyy-MM-dd"), 1, 7)
    val raw = Tables(spark, sf, "orders")
      .filter(month >= "1995-01" && month <= "1995-06")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_ct"))
      .sort("o_orderpriority")
    assert(x27.select("o_orderpriority", "order_ct").collect().toSeq ==
      raw.collect().toSeq)
  }

  test("streaming maintenance: a foreachBatch appender refreshes the " +
      "index each batch and pruning stays live") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipidx_stream_").toString
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    try {
      (1 to 50).map(i => (i.toLong, i * 3L)).toDF("k", "v")
        .repartitionByRange(2, col("k"))
        .write.mode("overwrite").parquet(s"$root/t")
      SkipIndex.register(spark, "stream_spec", s"$root/t", Seq("k"))
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      source.addData((51L to 80L).map(i => (i, i * 3L)): _*)
      source.addData((81L to 100L).map(i => (i, i * 3L)): _*)
      val stream = source.toDF().toDF("k", "v")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("append").parquet(s"$root/t")
          SkipIndex.refresh(spark, "stream_spec")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      stream.awaitTermination(120000)
      // pruning is live over the post-stream store: the low-range box
      // skips the appended files, and totals are exact
      val low = SkipIndex.navigate(
        spark.read.parquet(s"$root/t").filter(col("k") <= 25L))
      val total = scanFileCount(
        spark.read.parquet(s"$root/t").filter(col("k") > -1L))
      assert(scanFileCount(low) < total,
        s"post-stream pruning dead: ${scanFileCount(low)} of $total")
      assert(low.count() == 25L)
      assert(spark.read.parquet(s"$root/t").count() == 100L)
    } finally {
      SkipIndex.unregister(spark, "stream_spec")
      rm(new java.io.File(root))
    }
  }

  test("review regressions: alias shadowing, re-typed schemas, and " +
      "FileIndex.refresh all fail OPEN (no pruning, right answers)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipidx_regr_").toString
    import spark.implicits._
    try {
      (1 to 100).map(i => (i.toLong, s"r$i"))
        .toDF("k", "s").repartitionByRange(4, col("k"))
        .write.mode("overwrite").parquet(s"$root/t")
      SkipIndex.register(spark, "regr_spec", s"$root/t", Seq("k"))
      // (a) a nondeterministic Project computing a same-named 'k'
      // keeps its Filter above it (no pushdown) — the stats describe
      // the STORE's k, not the derived one, so nothing may prune
      val shadowQ = spark.read.parquet(s"$root/t")
        .select((rand(7) * 100).cast("long").as("k"), col("s"))
        .filter(col("k") <= 10L)
      val shadow = SkipIndex.navigate(shadowQ)
      assert(scanFileCount(shadow) == 4,
        s"alias-shadowed filter must not prune: ${scanFileCount(shadow)}")
      assert(shadow.count() == shadowQ.count())
      // (b) a user-supplied schema that re-types the stats column:
      // PLANNING must neither crash (pre-fix: ClassCastException
      // comparing a long min against a string literal) nor prune.
      // (Executing such a read fails in vanilla Spark regardless —
      // parquet INT64 can't be served as string — so only the
      // planning behavior is the index's business.)
      val retyped = SkipIndex.navigate(
        spark.read.schema("k STRING, s STRING").parquet(s"$root/t")
          .filter(col("k") <= "10"))
      assert(scanFileCount(retyped) == 4,
        s"re-typed stats column must not prune: ${scanFileCount(retyped)}")
      // (c) refresh() on a pruned FileIndex fails OPEN: the keep-set
      // was computed against the pre-refresh listing
      val nav = SkipIndex.navigate(
        spark.read.parquet(s"$root/t").filter(col("k") <= 10L))
      val idx = nav.queryExecution.optimizedPlan.collectLeaves()
        .collectFirst {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation =>
            lr.relation.asInstanceOf[org.apache.spark.sql.execution
              .datasources.HadoopFsRelation].location
        }.get
      assert(idx.inputFiles.length < 4)
      idx.refresh()
      assert(idx.inputFiles.length == 4,
        "a refreshed pruned index must serve the full listing")
    } finally {
      SkipIndex.unregister(spark, "regr_spec")
      rm(new java.io.File(root))
    }
  }

  test("session-wide route: the injected rule prunes without navigate") {
    val s2 = spark.newSession()
    SkipIndex.enable(s2)
    val root = java.nio.file.Files
      .createTempDirectory("graft_skipidx_wide_").toString
    try {
      import s2.implicits._
      (1 to 100).map(i => (i.toLong, i * 2L)).toDF("k", "v")
        .repartitionByRange(4, col("k"))
        .write.mode("overwrite").parquet(s"$root/t")
      SkipIndex.register(s2, "wide_spec", s"$root/t", Seq("k"))
      val q0 = s2.read.parquet(s"$root/t").filter(col("k") <= 10L)
        .agg(sum(col("v")).as("sv"))
      assert(scanFileCount(q0) == 1,
        s"session-wide rule did not prune: ${scanFileCount(q0)} files")
      assert(q0.head.getLong(0) == (1 to 10).map(_ * 2L).sum)
      // the base session holds no 'wide_spec' registration — its own
      // scans of the same store stay unpruned
      val other = spark.read.parquet(s"$root/t").filter(col("k") <= 10L)
      assert(scanFileCount(other) == 4)
    } finally {
      SkipIndex.clear(s2)
      rm(new java.io.File(root))
    }
  }
}
