package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.{AggRewrite, SkipIndex}

/** Cross-session persistence of the serving catalogs (round-14 #1):
  * materialize/register write a sidecar manifest beside the store;
  * `attach` in a brand-new session re-registers from it and re-signs
  * the staleness fence against the live listing. A restart must no
  * longer silently demote navigation and zone-map pruning to raw
  * scans — and a store whose inputs changed since the manifest was
  * blessed must REFUSE to attach (raw fall-through stays the only
  * sound serving path until a refresh re-signs it). */
class CatalogPersistSpec extends SparkSuite {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def scanPaths(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }.toSet

  private def scanFiles(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Nil
      }
      case _ => Nil
    }.toSet

  /** Plan shape with exprIds erased — cross-session plans allocate
    * fresh ids but must otherwise be node-for-node identical. */
  private def planShape(df: DataFrame): String =
    df.queryExecution.optimizedPlan.treeString
      .replaceAll("#\\d+", "#")

  test("AggRewrite.attach: a NEW session re-arms navigation from the " +
      "manifest — plan-shape identical, delta state carried, " +
      "post-append attach refuses") {
    val dir = tmp("cat_agg_base")
    val root = tmp("cat_agg_sum")
    Tables(spark, sf, "orders").write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    try {
      def baseOf(s: SparkSession) = s.read.parquet(s"$dir/orders.parquet")
      val keys = Seq(
        "cur_date" -> date_format(col("o_orderdate"), "yyyy-MM-dd"),
        "prio" -> col("o_orderpriority"))
      val measures = Seq(
        ("amount_sum", "sum",
          col("o_totalprice").cast(
            org.apache.spark.sql.types.DecimalType(18, 2))),
        ("amount_cnt", "count",
          col("o_totalprice").cast(
            org.apache.spark.sql.types.DecimalType(18, 2))),
        ("order_ct", "count_star", lit(1)))
      AggRewrite.materialize(spark, "cat_orders", baseOf(spark), keys,
        measures, root, partitionBy = Some("cur_date"))
      def rawQ(s: SparkSession) = baseOf(s)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(sum(col("o_totalprice").cast(
            org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("amount"), count(lit(1)).as("ct"))
      val navA = AggRewrite.navigate(rawQ(spark))
      assert(scanPaths(navA).exists(_.contains("/v0")),
        s"registered session did not navigate: ${scanPaths(navA)}")

      // fold one delta batch so the attach must pick up the d1
      // version AND the lastDelta watermark, not the v0 the manifest
      // was first written with
      val batch = baseOf(spark).limit(2).withColumn("sign", lit(1))
      batch.drop("sign").write.mode("append")
        .parquet(s"$dir/orders.parquet")
      AggRewrite.applyDelta(spark, "cat_orders", baseOf(spark), batch,
        "sign", batchId = 1L)

      val s2 = spark.newSession()
      val summary2 = AggRewrite.attach(s2, root)
      assert(summary2.columns.toSet ==
        Set("cur_date", "prio", "amount_sum", "amount_cnt", "order_ct"))
      val navB = AggRewrite.navigate(rawQ(s2))
      assert(scanPaths(navB).exists(_.contains("/d1")),
        s"attach did not re-arm onto the folded version: " +
          s"${scanPaths(navB)}")
      assert(planShape(navB) == planShape(
          AggRewrite.navigate(rawQ(spark))),
        s"plans drifted across sessions:\n${planShape(navB)}\n----\n" +
          planShape(AggRewrite.navigate(rawQ(spark))))
      assert(navB.sort("prio").collect().toSeq ==
        rawQ(s2).sort("prio").collect().toSeq)

      // the carried lastDelta makes a replayed batch a no-op in the
      // attached session (no new version dir appears)
      AggRewrite.applyDelta(s2, "cat_orders", baseOf(s2), batch,
        "sign", batchId = 1L)
      val versions = new java.io.File(root).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(versions == Set("v0", "d1"),
        s"replayed batch must not land a new version: $versions")

      // a base append AFTER the manifest was signed refuses to attach
      baseOf(spark).limit(1).write.mode("append")
        .parquet(s"$dir/orders.parquet")
      val s3 = spark.newSession()
      val refusal = intercept[IllegalStateException] {
        AggRewrite.attach(s3, root)
      }
      assert(refusal.getMessage.contains("re-materialize"),
        refusal.getMessage)
      // ...and a refresh from a REGISTERED session re-signs the
      // manifest, after which the new session attaches cleanly
      val newDays = baseOf(spark).limit(1)
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .collect().map(_.getString(0)).toSeq
      AggRewrite.refreshPartitions(spark, "cat_orders", baseOf(spark),
        newDays.distinct)
      AggRewrite.attach(s3, root)
      val navC = AggRewrite.navigate(rawQ(s3))
      assert(scanPaths(navC).exists(_.contains("/d1")),
        s"post-refresh attach did not navigate: ${scanPaths(navC)}")
      assert(navC.sort("prio").collect().toSeq ==
        rawQ(s3).sort("prio").collect().toSeq)
    } finally {
      AggRewrite.unregister(spark, "cat_orders")
      rm(new java.io.File(dir)); rm(new java.io.File(root))
    }
  }

  test("SkipIndex.attach: a NEW session re-arms file pruning from the " +
      "manifest — identical kept-file set, no stats re-scan, " +
      "post-append attach refuses until refresh re-signs") {
    val store = tmp("cat_skip_store") + "/orders_c"
    Tables(spark, sf, "orders")
      .repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode("overwrite").parquet(store)
    try {
      SkipIndex.register(spark, "cat_skip", store, Seq("o_orderdate"))
      def rawQ(s: SparkSession) = s.read.parquet(store)
        .filter(col("o_orderdate") >= "1995-01-01" &&
          col("o_orderdate") <= "1995-03-31")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("ct"))
      val prunedA = SkipIndex.navigate(rawQ(spark))
      val keptA = scanFiles(prunedA)
      assert(keptA.size < scanFiles(rawQ(spark)).size,
        "registered session pruned nothing")

      val s2 = spark.newSession()
      SkipIndex.attach(s2, store)
      val prunedB = SkipIndex.navigate(rawQ(s2))
      assert(scanFiles(prunedB) == keptA,
        s"attached session kept a different file set:\n" +
          s"${scanFiles(prunedB)}\nvs\n$keptA")
      assert(planShape(prunedB) == planShape(prunedA),
        s"plans drifted:\n${planShape(prunedB)}\n----\n" +
          planShape(prunedA))
      assert(prunedB.sort("o_orderpriority").collect().toSeq ==
        rawQ(s2).sort("o_orderpriority").collect().toSeq)

      // append a file: the catalog no longer describes the store —
      // attach refuses with the refresh advice
      spark.read.parquet(store).limit(1).write.mode("append")
        .parquet(store)
      val s3 = spark.newSession()
      val refusal = intercept[IllegalStateException] {
        SkipIndex.attach(s3, store)
      }
      assert(refusal.getMessage.contains("refresh"), refusal.getMessage)
      // refresh() in the registered session stats-scans ONLY the new
      // file and re-signs the manifest; the new session then attaches
      SkipIndex.refresh(spark, "cat_skip")
      SkipIndex.attach(s3, store)
      val prunedC = SkipIndex.navigate(rawQ(s3))
      assert(scanFiles(prunedC).size < scanFiles(rawQ(s3)).size,
        "post-refresh attach pruned nothing")
      assert(prunedC.sort("o_orderpriority").collect().toSeq ==
        rawQ(s3).sort("o_orderpriority").collect().toSeq)
    } finally {
      SkipIndex.unregister(spark, "cat_skip")
      rm(new java.io.File(store).getParentFile)
    }
  }

  test("composed x27 shape across sessions: attach re-arms navigation " +
      "ONTO the clustered summary AND zone-map pruning INSIDE it") {
    val dir = tmp("cat_x27_base")
    val root = tmp("cat_x27_sum")
    Tables(spark, sf, "orders").write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    try {
      def baseOf(s: SparkSession) = s.read.parquet(s"$dir/orders.parquet")
      val keys = Seq(
        "cur_date" -> date_format(col("o_orderdate"), "yyyy-MM-dd"),
        "o_custkey" -> col("o_custkey"))
      val measures = Seq(
        ("amount_sum", "sum", col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2))),
        ("order_ct", "count_star", lit(1)))
      AggRewrite.materialize(spark, "cat_x27", baseOf(spark), keys,
        measures, root, clusterBy = Seq("cur_date"))
      SkipIndex.register(spark, "cat_x27_skip", s"$root/v0",
        Seq("cur_date"))
      def rawQ(s: SparkSession) = baseOf(s)
        .filter(date_format(col("o_orderdate"), "yyyy-MM-dd")
          .between("1995-01-01", "1995-03-31"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2))).as("amount"))
      def served(s: SparkSession) =
        SkipIndex.navigate(AggRewrite.navigate(rawQ(s)))
      val a = served(spark)
      assert(scanPaths(a).exists(_.contains("/v0")),
        s"did not navigate onto the summary: ${scanPaths(a)}")
      val keptA = scanFiles(a)
      val allSummaryFiles = scanFiles(
        spark.read.parquet(s"$root/v0").groupBy(col("o_custkey"))
          .agg(count(lit(1))))
      assert(keptA.size < allSummaryFiles.size,
        s"zone maps pruned nothing inside the summary: " +
          s"${keptA.size} of ${allSummaryFiles.size}")

      val s2 = spark.newSession()
      // through the public facade — one line per catalog
      graft.api.Graft.attachSummary(s2, root)
      graft.api.Graft.attachSkipIndex(s2, s"$root/v0")
      val b = served(s2)
      assert(scanPaths(b).exists(_.contains("/v0")) &&
        scanFiles(b) == keptA && planShape(b) == planShape(a),
        s"composed serving drifted across sessions:\n${planShape(b)}" +
          s"\n----\n${planShape(a)}")
      assert(b.sort("o_custkey").collect().toSeq ==
        rawQ(s2).sort("o_custkey").collect().toSeq)
    } finally {
      AggRewrite.unregister(spark, "cat_x27")
      SkipIndex.unregister(spark, "cat_x27_skip")
      rm(new java.io.File(dir)); rm(new java.io.File(root))
    }
  }
}
