package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityOps

/** Invariants of the corpus-quality operators beyond the oracle hash:
  * redaction is complete (no pattern survives), repetition signals stay
  * in their ranges, and int8 ANN keeps real recall against brute force. */
class QualityOpsSpec extends SparkSuite {

  test("p15: redaction removes every planted match") {
    val d = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        QualityOps.redact(concat(col("text"),
          lit(" u1@a.io +1-555-77 192.168.1.1"))).as("red"))
    Seq(QualityOps.emailPat, QualityOps.phonePat, QualityOps.ipPat)
      .foreach { p =>
        assert(d.filter(col("red").rlike(p)).count() == 0,
          s"pattern survived redaction: $p")
      }
    // counts are all positive on the planted fixture
    val agg = q("p15_pii_redact").agg(sum(col("email_ct")),
      sum(col("phone_ct")), sum(col("ip_ct")), sum(col("removed_chars")))
      .head
    (0 until 4).foreach(i => assert(agg.getLong(i) > 0))
  }

  test("t10: repetition signals stay in range") {
    val r = q("t10_repetition_signals")
    assert(r.count() > 0)
    assert(r.filter(col("dup_frac") < 0 || col("dup_frac") >= 1)
      .count() == 0)
    assert(r.filter(col("top_bigram_ct") > col("n_tokens") - 1)
      .count() == 0)
    assert(r.filter(col("n_distinct") > col("n_tokens")).count() == 0)
  }

  test("v7: int8 quantized ANN keeps >= 3/5 exact neighbors per query") {
    val r = q("v7_ann_int8_topk")
    assert(r.count() == 10)
    assert(r.filter(!col("int8_ok")).count() == 0)
  }

  test("c8: funnel gates are monotone per source") {
    val r = q("c8_quality_funnel")
    assert(r.count() > 0)
    assert(r.filter(col("len_ok_ct") > col("total_ct") ||
      col("rep_ok_ct") > col("len_ok_ct") ||
      col("clean_ct") > col("rep_ok_ct")).count() == 0)
    // the planted PII fixture actually cuts documents at the last gate
    val cut = r.agg(sum(col("rep_ok_ct") - col("clean_ct"))).head.getLong(0)
    assert(cut > 0)
  }

  test("v8: PQ shortlist + exact re-rank keeps >= 3/5 per query") {
    val r = q("v8_ann_pq_topk")
    assert(r.count() == 10)
    assert(r.filter(!col("pq_ok")).count() == 0)
  }

  test("c9: packing conserves tokens and stays within fill bounds") {
    val r = q("c9_sequence_packing")
    assert(r.count() > 0)
    // every sequence is at most full; the layout wastes less than one
    // sequence per source (concat-and-chunk leaves only the tail slack)
    assert(r.filter(col("fill_rate") <= 0 || col("fill_rate") > 1)
      .count() == 0)
    assert(r.filter(col("token_sum") >
      col("n_sequences") * 2048L).count() == 0)
    assert(r.filter(col("token_sum") <=
      (col("n_sequences") - 1) * 2048L).count() == 0)
    assert(r.filter(col("boundary_docs") >= col("doc_ct")).count() == 0)
  }

  test("m4: resize never grows a payload and hits the budget") {
    val r = q("m4_resize_stats")
    assert(r.count() > 0)
    assert(r.filter(col("out_bytes") > col("in_bytes")).count() == 0)
    assert(r.filter(col("out_bytes") > col("media_ct") * 256L)
      .count() == 0)
  }

  test("m3: frame dedup finds exactly the planted pairs") {
    val r = q("m3_frame_near_dup")
    // re-uploads share all 4 frames; every kept pair involves a planted id
    assert(r.filter(col("shared_ct") === 4).count() > 0)
    assert(r.filter(col("b_id") < 1000000000L).count() == 0,
      "a pair of two ORIGINAL docs survived the threshold — accidental " +
        "frame collision, fixture no longer analytic")
  }
}
