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

  test("batch fold == one-shot rebuild against the frozen artifacts; " +
      "a drifted batch refuses with rebuild advice") {
    import spark.implicits._
    val em = spark.range(0, 400).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(VectorOps.embDim)), i =>
        sin(i * (col("id") + 1))).as("emb"))
    val initial = em.filter(pmod(col("vec_id"), lit(10)) =!= 3)
    val arriving = em.filter(pmod(col("vec_id"), lit(10)) === 3)
      .select(col("vec_id"), col("emb").as("embedding"))
    val art = IncrementalIndex.trainOn(initial)
    assert(!art.meanAssignD2.isNaN && art.meanAssignD2 > 0.0,
      s"train must record the drift yardstick: ${art.meanAssignD2}")
    val stored = IncrementalIndex.encodeBatch(
      initial.select(col("vec_id"), col("emb").as("embedding")), art)
    // fold: the arriving tenth encodes against the FROZEN artifacts
    // and unions in — row-identical to one-shot-encoding the grown
    // corpus with the same artifacts (a query served from the folded
    // index sees exactly the rebuild's inverted lists)
    val grown = IncrementalIndex.fold(stored, arriving, art)
    val rebuilt = IncrementalIndex.encodeBatch(
      em.select(col("vec_id"), col("emb").as("embedding")), art)
    assert(grown.count() == rebuilt.count())
    assert(grown.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(grown).count() == 0,
      "folded code table != one-shot rebuild with frozen artifacts")
    // a distribution shift past the gate refuses — the frozen
    // quantizers would quantize the batch badly and recall would
    // silently rot; the message routes to re-train
    val drifted = arriving.select(col("vec_id"),
      transform(col("embedding"), x => x * 100 + 50).as("embedding"))
    val refusal = intercept[IllegalStateException] {
      IncrementalIndex.fold(stored, drifted, art)
    }
    assert(refusal.getMessage.contains("re-train"), refusal.getMessage)
    // nothing was mutated by the refusal: stored still folds cleanly
    assert(IncrementalIndex.fold(stored, arriving, art).count() ==
      rebuilt.count())
  }
}
