package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs — one JVM-wide session (Spark reuses the
  * active session across suites via getOrCreate). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Verify.session("local[4]", "4")
  lazy val sf: String = "/root/testdata/sf0.001"
  def q(name: String) = SparkEntry.queries(name)(spark, sf)
}
