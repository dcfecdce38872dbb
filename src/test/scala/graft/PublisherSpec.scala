package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import graft.operators.{PublisherServer, ServingApi}

/** The publisher's HTTP shell: real sockets, real requests — the
  * reference's three REST endpoints served over the JDK HttpServer and
  * exercised with the JDK HttpClient (no test doubles). */
class PublisherSpec extends SparkSuite {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def get(port: Int, pathQ: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val res = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$pathQ")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("publisher serves /gmv, /province, /ch with the reference envelopes") {
    val orderStore = tmp("pub_orders")
    val trafficStore = tmp("pub_traffic")
    ServingApi.buildStore(spark, sf, orderStore)
    PublisherServer.buildTrafficStore(spark, sf, trafficStore)
    val pub = PublisherServer.start(spark, orderStore, trafficStore, 0)
    try {
      val day = spark.read.parquet(orderStore)
        .agg(min(col("cur_date").cast("string"))).head.getString(0)

      // /gmv: numeric envelope equals the direct store query
      val (gc, gb) = get(pub.port, s"/gmv?date=$day")
      assert(gc == 200, gb)
      val expectedGmv =
        ServingApi.gmv(spark, orderStore, day).head.getDouble(0)
      assert(gb == s"""{"status":0,"data":$expectedGmv}""", gb)

      // /gmv default date = newest partition (the DateFormatUtil.now()
      // analog): must equal querying the max day explicitly
      val lastDay = spark.read.parquet(orderStore)
        .agg(max(col("cur_date").cast("string"))).head.getString(0)
      assert(get(pub.port, "/gmv")._2 ==
        get(pub.port, s"/gmv?date=$lastDay")._2)
      assert(get(pub.port, "/gmv?date=0")._2 ==
        get(pub.port, s"/gmv?date=$lastDay")._2)

      // /province: every (name, value) pair present, ordered, enveloped
      val (pc, pb) = get(pub.port, s"/province?date=$day")
      assert(pc == 200, pb)
      val provRows = ServingApi.province(spark, orderStore, day)
        .orderBy(col("order_amount").desc, col("province_name")).collect()
      val expectedMap = provRows.map(r =>
        s"""{"name":"${r.getString(0)}","value":${r.getDouble(1)}}""")
        .mkString(",")
      assert(pb == s"""{"status":0,"data":{"mapData":[$expectedMap],""" +
        s""""valueName":"order_amount"}}""", pb)

      // /ch: categories/series parallel arrays, limit respected
      val tday = spark.read.parquet(trafficStore)
        .agg(max(col("cur_date").cast("string"))).head.getString(0)
      val (cc, cb) = get(pub.port, s"/ch?date=$tday&limit=3")
      assert(cc == 200, cb)
      val chRows = PublisherServer.chUv(spark, trafficStore, tday, 3).collect()
      assert(chRows.length <= 3)
      val cats = chRows.map(r => s""""${r.getString(0)}"""").mkString(",")
      val data = chRows.map(_.getLong(1)).mkString(",")
      assert(cb == s"""{"status":0,"data":{"categories":[$cats],""" +
        s""""series":[{"name":"ch","data":[$data]}]}}""", cb)

      // unknown sub-path under a context → 404 envelope, server stays up
      assert(get(pub.port, "/gmv/nope")._1 == 404)
      assert(get(pub.port, s"/gmv?date=$day")._1 == 200)
    } finally pub.stop()
  }
}
