package graft

import org.apache.spark.sql.functions._
import graft.streaming.{StatefulStreams, UserLoginApp}

/** The composed DwsUserUserLoginWindow twin: keyed lastLoginDate state
  * (uu/back flags) chained into the 10 s window, reconciled against the
  * lag()-window batch twin. */
class UserLoginAppSpec extends SparkSuite {

  test("user-login app: streamed flags equal the batch lag twin") {
    val flagged = UserLoginApp.flagStream(
      UserLoginApp.logins(StatefulStreams.eventStream(spark, sf)))
    val sq = flagged.toDF().writeStream.outputMode("append")
      .format("memory").queryName("ul_flags").start()
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table("ul_flags")
    val batch = UserLoginApp.flagBatch(
      UserLoginApp.logins(Tables(spark, sf, "events")))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streamed uu/back flags != batch lag twin")
    // structural: uu counts once per (user, day); back implies uu
    assert(streamed.filter(col("back") === 1 && col("uu") === 0)
      .count() == 0)
  }

  test("user-login window sums reconcile on closed windows (a18 shape)") {
    val flagged = UserLoginApp.flagStream(
      UserLoginApp.logins(StatefulStreams.eventStream(spark, sf)))
    val sq = UserLoginApp.windowSums(flagged.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("ul_win").start()
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table("ul_win")
    val e = Tables(spark, sf, "events")
    val wm = e.filter(col("event_type") === "view")
      .agg(date_format(timestamp_seconds(
          graft.functions.Fns.nsToSec(max(col("ts")))) -
        expr("INTERVAL 3 SECONDS"), "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0)
    val closed = UserLoginApp.batch(spark, sf).filter(col("edt") <= lit(wm))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closed).count() == 0 &&
      closed.exceptAll(streamed).count() == 0,
      "chained window sums != batch twin on closed windows")
  }
}
