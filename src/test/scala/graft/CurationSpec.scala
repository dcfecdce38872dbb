package graft

import org.apache.spark.sql.functions._

/** Invariants for the curation layer (CurationOps) and the new DWD SQL
  * apps — structural properties the oracle value-compare can't state. */
class CurationSpec extends SparkSuite {

  test("c1 clusters partition the pair-graph nodes; id = min member") {
    val pairs = q("d3_near_dup_pairs")
    val nodes = pairs.select(col("a_id").as("id"))
      .union(pairs.select(col("b_id").as("id"))).distinct().count()
    val clusters = q("c1_dedup_clusters")
    // every node is in exactly one cluster
    assert(clusters.agg(sum(col("member_ct"))).head.getLong(0) == nodes)
    // cluster_id is itself a member, and is the minimum member id
    assert(clusters.filter(col("cluster_id") > col("max_member_id")).count() == 0)
    assert(clusters.filter(col("member_ct") < 2).count() == 0,
      "every component has >= 2 members by construction")
  }

  test("c1 cluster ids are closed under the pair relation") {
    // both endpoints of every verified pair land in the same cluster
    val labels = operators.CurationOps.clusterLabels(spark, sf)
    val pairs = q("d3_near_dup_pairs")
    val mismatched = pairs
      .join(labels.select(col("id"), col("label").as("la")),
        col("a_id") === col("id"))
      .drop("id")
      .join(labels.select(col("id"), col("label").as("lb")),
        col("b_id") === col("id"))
      .filter(col("la") =!= col("lb"))
    assert(mismatched.count() == 0)
  }

  test("c2 funnel counts are consistent and exhaustive") {
    val f = q("c2_kept_corpus")
    val bad = f.filter(col("total_ct") =!=
      col("kept_ct") + col("drop_exact_ct") + col("drop_quality_ct") +
        col("drop_neardup_ct"))
    assert(bad.count() == 0, "reasons must partition each source")
    val total = f.agg(sum(col("total_ct"))).head.getLong(0)
    assert(total == Tables(spark, sf, "documents").count())
  }

  test("c3 split is deterministic, exhaustive, and stable across runs") {
    val a = q("c3_hash_split").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = q("c3_hash_split").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.sum == Tables(spark, sf, "documents").count())
  }

  test("c4 emits at most k rows per group, ranked without gaps") {
    val t = q("c4_topk_per_group")
    assert(t.groupBy("source").count().filter(col("count") > 3).count() == 0)
    // ranks within each group are exactly 1..n
    val bad = t.groupBy("source")
      .agg(max(col("rk")).as("mx"), count(lit(1)).as("n"),
        min(col("rk")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
  }

  test("refund-pay wide: dual dic aliases resolve independently") {
    val df = q("sql_dwd_refund_pay_wide")
    // the two lookups hit different codes on some rows
    assert(df.filter(col("payment_type_name") =!= col("refund_type_name"))
      .count() > 0)
    // every code resolved (inner lookup join, bounded dictionary)
    assert(df.filter(col("payment_type_name").isNull ||
      col("refund_type_name").isNull).count() == 0)
  }

  test("cart-add keeps inserts and rising updates only, delta positive") {
    val df = q("sql_dwd_cart_add")
    assert(df.filter(col("sku_num_delta") <= 0).count() == 0)
  }
}
