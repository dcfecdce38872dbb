package graft

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalIndex
import graft.operators.VectorOps

/** Incremental ANN-index maintenance: new embeddings encoded per batch
  * against the FROZEN artifacts must accumulate into exactly the code
  * table the one-shot batch build produces (a query served from the
  * grown index sees the index a full rebuild would produce). */
class IncrementalIndexSpec extends SparkSuite {

  test("incrementally grown IVFPQ store equals the one-shot code table") {
    val src = java.nio.file.Files.createTempDirectory("idx_src").toString
    val store = java.nio.file.Files.createTempDirectory("idx_store").toString
    val ckp = java.nio.file.Files.createTempDirectory("idx_ckp").toString
    val em = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // sharded arrival (one file per shard → one micro-batch per shard
    // under the file source's default ordering)
    (0 until 3).foreach { i =>
      em.filter(pmod(col("vec_id"), lit(3)) === i).repartition(1)
        .write.mode("overwrite").parquet(s"$src/shard$i.parquet")
    }
    val art = IncrementalIndex.train(spark, sf)
    val schema = spark.read.parquet(s"$src/shard0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one micro-batch per shard
      .parquet(s"$src/shard*.parquet")
    val sq = IncrementalIndex.run(stream, art, store, ckp)
    sq.processAllAvailable()
    sq.stop()

    val got = spark.read.parquet(store)
    val expected = VectorOps.ivfpqCodes(spark, sf)
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0,
      "incrementally grown code table != one-shot batch encoding")
    // incrementality was real: multiple micro-batches committed
    val batches = new java.io.File(s"$ckp/commits")
      .listFiles().count(f => f.getName.forall(_.isDigit))
    assert(batches >= 2, s"expected >=2 micro-batches, got $batches")
  }
}
