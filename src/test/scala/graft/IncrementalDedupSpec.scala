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
}
