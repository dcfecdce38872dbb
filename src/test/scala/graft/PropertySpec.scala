package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the shared primitives (SURVEY.md §5 item 3):
  * window alignment, exact integer division, dedup idempotence. Raw
  * Gen sampling with fixed seeds (scalatestplus bridge isn't a declared
  * dependency). */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = Verify.session("local[4]", "4")

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("divFloor equals floor division for any non-negative long (100 cases)") {
    import spark.implicits._
    val cases = samples(for {
      v <- Gen.chooseNum(0L, Long.MaxValue / 2)
      d <- Gen.oneOf(1000L, 1000000000L, 10000000000L)
    } yield (v, d), 100)
    val df = cases.toDF("v", "d")
    // evaluate all divisors in one pass per distinct d
    cases.groupBy(_._2).foreach { case (d, vs) =>
      val got = vs.map(_._1).toDF("v")
        .select(graft.functions.Fns.divFloor(col("v"), d).as("q"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == vs.map(x => x._1 / d))
    }
    assert(df.count() == 100)
  }

  test("windowStartSec aligns to epoch and contains its timestamp (200 cases)") {
    import spark.implicits._
    val ns = samples(Gen.chooseNum(0L, 4102444800L * 1000000000L), 200)
    val rows = ns.toDF("ts")
      .select(col("ts"), graft.functions.Fns.windowStartSec(col("ts"), 10L)
        .as("w"))
      .collect()
    rows.foreach { r =>
      val sec = r.getLong(0) / 1000000000L
      val w = r.getLong(1)
      assert(w % 10 == 0 && w <= sec && sec < w + 10, s"ts=${r.getLong(0)}")
    }
  }

  test("dedup-last is idempotent on random event logs") {
    import spark.implicits._
    val gen = Gen.listOfN(80, for {
      u <- Gen.chooseNum(1L, 5L)
      t <- Gen.chooseNum(0L, 50L) // small range → many ties on ts
      id <- Gen.chooseNum(0L, 100000L)
    } yield (u, t, id))
    samples(gen, 10).foreach { rows =>
      val df = rows.toDF("user_id", "ts", "event_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val once = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val twice = once.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(once.exceptAll(twice).count() == 0 &&
        twice.exceptAll(once).count() == 0)
    }
  }

  test("daily-first stream == batch distinct user-days on random ordered logs") {
    import spark.implicits._
    import graft.streaming.StatefulStreams.UserEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400L
    val gen = Gen.listOfN(50, for {
      u <- Gen.chooseNum(1L, 4L)
      s <- Gen.chooseNum(0L, 5 * day)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield UserEvent(u, s, id, "view", 1.0))
    samples(gen, 4).zipWithIndex.foreach { case (events, i) =>
      // time-ordered arrival split into 3 micro-batches (the reference's
      // monotonic-watermark assumption, SURVEY §2.8 W1)
      val ordered = events.sortBy(e => (e.sec, e.event_id))
      val chunks = ordered.grouped(math.max(1, ordered.size / 3 + 1)).toSeq
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[UserEvent]
      val sq = source.toDS().groupByKey(_.user_id)
        .flatMapGroupsWithState(
          org.apache.spark.sql.streaming.OutputMode.Append,
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
          graft.streaming.StatefulStreams.trackDailyFirst _)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"prop_df_$i").start()
      chunks.foreach { c => source.addData(c); sq.processAllAvailable() }
      sq.stop()
      val got = spark.table(s"prop_df_$i")
        .select(col("user_id"), col("cur_date")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = events.map(e => (e.user_id,
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochSecond(e.sec)))).toSet
      assert(got == want, s"sample $i: stream/batch user-day sets differ")
    }
  }

  test("normalizeEventTs is session-timezone independent on NTZ data") {
    val spark = Verify.session("local[4]", "4")
    val sf = "/root/testdata/sf0.001"
    val utc = Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts"))
      .orderBy("event_id").limit(50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a library user's session in another zone must read the same epochs
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    try {
      val cn = Tables(shifted, sf, "events")
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("ts"))
        .orderBy("event_id").limit(50).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cn == utc, "epoch-nanos differ across session timezones")
    } finally shifted.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("minhash jaccard estimate correlates with exact jaccard") {
    import spark.implicits._
    // two docs sharing half their tokens → signature agreement ≈ 1/3..2/3
    val docs = Seq(
      (1L, (0 until 40).map(i => s"tok$i").mkString(" ")),
      (2L, (20 until 60).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    import graft.operators.DedupOps.{P, aK, bK}
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val mhs = (0 until 12).map(k =>
      min((col("h") * lit(aK(k)) + lit(bK(k))) % lit(P)).as(s"mh$k"))
    val sig = toks.groupBy("doc_id").agg(mhs.head, mhs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong)).toMap
    val agree = sig(1L).zip(sig(2L)).count { case (a, b) => a == b }
    // exact J = 20/60 = 1/3; 12 hashes → expect ~4 agreements, allow wide band
    assert(agree >= 1 && agree <= 8, s"minhash agreement $agree outside band")
  }

  test("native minhash_sig == per-permutation mins on random hash arrays") {
    val cases = samples(Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 32) - 1)),
      100)
    import graft.plans.MinhashSignature
    val K = graft.operators.DedupOps.numHashes
    cases.foreach { hs =>
      val expr = MinhashSignature(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          hs, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)), K)
      val got = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      val want = (0 until K).map(k =>
        hs.map(h => (h * MinhashSignature.aK(k) + MinhashSignature.bK(k))
          % MinhashSignature.P).min)
      assert(got == want, s"signature mismatch for $hs")
    }
  }

  test("minhash_sig SQL surface: optional k, BIGINT k, null elements") {
    import org.apache.spark.sql.functions._
    import graft.plans.MinhashSignature
    MinhashSignature.register(spark, MinhashSignature.DefaultK)
    // 1-arg call defaults to DefaultK instead of IndexOutOfBounds
    val one = spark.sql(
      "SELECT minhash_sig(array(CAST(7 AS BIGINT), CAST(11 AS BIGINT)))")
      .head.getSeq[Long](0)
    assert(one.length == MinhashSignature.DefaultK)
    // a BIGINT k literal works (eval() returns java.lang.Long there)
    val big = spark.sql(
      "SELECT minhash_sig(array(CAST(7 AS BIGINT)), CAST(4 AS BIGINT))")
      .head.getSeq[Long](0)
    assert(big.length == 4)
    // null ELEMENTS are skipped, matching array_min's treatment in the
    // composed form — not read as garbage zeros
    val withNull = spark.sql(
      "SELECT minhash_sig(array(CAST(7 AS BIGINT), NULL, " +
        "CAST(11 AS BIGINT)), 4)").head.getSeq[Long](0)
    val noNull = spark.sql(
      "SELECT minhash_sig(array(CAST(7 AS BIGINT), " +
        "CAST(11 AS BIGINT)), 4)").head.getSeq[Long](0)
    assert(withNull == noNull, "null elements must not perturb the sig")
    // all-null behaves like empty: null out, not a MaxValue signature
    assert(spark.sql(
      "SELECT minhash_sig(array(CAST(NULL AS BIGINT)), 4)").head.isNullAt(0))
    // a non-literal/typed-wrong k is an upfront error, not a ClassCast
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(CAST(7 AS BIGINT)), 'x')")
        .collect()
    }
    // k <= 0 errors for INT literals exactly like it does for BIGINT —
    // never a silent empty signature (which would make every pair of
    // docs "identical" downstream)
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(CAST(7 AS BIGINT)), 0)")
        .collect()
    }
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(CAST(7 AS BIGINT)), -3)")
        .collect()
    }
    // zero-argument call gets the crafted arity message, not a raw
    // NoSuchElementException from children.head
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig()").collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("at least one argument"),
      s"wrong zero-arg error: ${e.getMessage}")
  }
}
