package graft

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalDedup
import graft.operators.DedupOps

/** Incremental crawl dedup: sharded arrival + per-batch join against the
  * accumulated signature store must find exactly the candidate set the
  * one-shot batch LSH finds. */
class IncrementalDedupSpec extends SparkSuite {

  test("incremental pairs over shards equal the one-shot batch set") {
    val src = java.nio.file.Files.createTempDirectory("inc_src").toString
    val store = java.nio.file.Files.createTempDirectory("inc_store").toString
    val ckp = java.nio.file.Files.createTempDirectory("inc_ckp").toString
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i).repartition(1)
        .write.mode("overwrite").parquet(s"$src/shard$i.parquet")
    }

    val sq = IncrementalDedup.run(spark, src, store, ckp)
    sq.processAllAvailable()
    sq.stop()

    val got = IncrementalDedup.pairs(spark, store)
    val expected = IncrementalDedup.batchPairs(
      DedupOps.stackedBands(docs), DedupOps.stackedBands(docs).limit(0))
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0,
      "incremental candidate set != one-shot batch candidate set")
    // incrementality was real: multiple micro-batches committed
    val batches = new java.io.File(s"$ckp/commits")
      .listFiles().count(f => f.getName.forall(_.isDigit))
    assert(batches >= 2, s"expected >=2 micro-batches, got $batches")
  }

  test("mega-bucket arrival: pair budget bounded, clusters equal the " +
      "one-shot capped set") {
    import spark.implicits._
    // 120 byte-identical docs (one template cluster — identical token
    // sets give identical minhash signatures, so ONE bucket per band)
    // plus 5 distinct docs, sharded over 4 arrival batches. The
    // bucketCliqueCap binds (120 >> cap): the uncapped pair set would
    // be 120·119/2 = 7140 clique edges; the capped budget is LINEAR —
    // each arrival meets ≤ cap stored members plus its batch's capped
    // clique/stars (≈ 2600 here) — and the contract is (a) that
    // linear pair count and (b) the same CLUSTERS as the
    // one-shot capped pipeline — per-bucket connectivity is what the
    // dedup decision consumes, and it is arrival-order-independent
    // even though hot-bucket star edges need not be (a member's bucket
    // rank only grows as more docs arrive, so finally-top-cap cliques
    // always meet; everyone else connects through the then-top-cap).
    val template = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val docs = ((0L until 120L).map(i => (i, "web", template)) ++
      Seq((200L, "web", "completely different content one"),
        (201L, "web", "another unrelated document here"),
        (202L, "web", "spark catalyst planning internals"),
        (203L, "web", "lakehouse table format notes"),
        (204L, "web", "streaming watermark semantics text")))
      .toDF("doc_id", "source", "text")
    val src = java.nio.file.Files.createTempDirectory("mb_src").toString
    val store = java.nio.file.Files.createTempDirectory("mb_store").toString
    val ckp = java.nio.file.Files.createTempDirectory("mb_ckp").toString
    (0 until 4).foreach { i =>
      val f = s"$src/shard$i.parquet"
      docs.filter(pmod(col("doc_id"), lit(4)) === i).repartition(1)
        .write.mode("overwrite").parquet(f)
      val d = new java.io.File(f)
      (d +: Option(d.listFiles()).getOrElse(Array.empty).toSeq)
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val sq = IncrementalDedup.run(spark, src, store, ckp)
    sq.processAllAvailable()
    sq.stop()
    val streamed = IncrementalDedup.pairs(spark, store)
      .select(col("a_id"), col("b_id"))
    val capped = DedupOps.candidatePairsFor(docs)
      .select(col("a_id"), col("b_id"))
    val uncappedCliqueEdges = 120L * 119L / 2L
    assert(streamed.count() > 0 &&
      streamed.count() < uncappedCliqueEdges / 2,
      s"pair budget did not bind: ${streamed.count()} edges " +
        s"(uncapped clique would be $uncappedCliqueEdges)")
    // cluster equality: same connected components, label = min member
    val sl = graft.api.Graft.componentLabels(streamed)
    val cl = graft.api.Graft.componentLabels(capped)
    assert(sl.exceptAll(cl).count() == 0 && cl.exceptAll(sl).count() == 0,
      "incremental capped clusters != one-shot capped clusters")
    // and the template cluster is ONE component containing all 120 docs
    assert(sl.filter(col("label") === 0L).count() == 120,
      "mega-bucket fragmented under the incremental cap")
  }
}
