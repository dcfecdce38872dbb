package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bitmap64, BitmapDistinct, BitmapMergeCount,
  BitmapMergePartial, BitmapPartial}

/** Roaring-style exact-distinct bitmap (functions/Bitmap.scala): the
  * container algebra must be a faithful set (vs a scala Set oracle
  * across the array→bitset upgrade boundary and under arbitrary merge
  * splits), serialization must be canonical (equal id sets ⇒ equal
  * bytes regardless of build order), and the Aggregators must equal
  * count(DISTINCT) exactly, partition-layout-independently. */
class BitmapSpec extends SparkSuite {

  private def rnd(seed: Long) = new scala.util.Random(seed)

  test("bitmap64 is a faithful set across the upgrade boundary") {
    val r = rnd(42)
    // cluster ids into few containers so the 4096 upgrade actually
    // trips; sprinkle negatives and distant keys for the 48-bit split
    val ids = Seq.fill(20000)(r.nextInt(9000).toLong) ++
      Seq.fill(3000)(1L << 33 | r.nextInt(300).toLong) ++
      Seq.fill(500)(-1L * r.nextInt(100000)) ++
      Seq(Long.MaxValue, Long.MinValue, 0L, -1L, 65535L, 65536L)
    val bm = new Bitmap64
    ids.foreach(bm.add)
    val truth = ids.toSet
    assert(bm.cardinality == truth.size.toLong)
    truth.foreach(v => assert(bm.contains(v), s"missing $v"))
    assert(!bm.contains(123456789L))
    // round trip
    val back = Bitmap64.deserialize(bm.serialize)
    assert(back.cardinality == truth.size.toLong)
    truth.foreach(v => assert(back.contains(v)))
  }

  test("serialization is canonical: build order and merge splits do " +
      "not change the bytes") {
    val r = rnd(7)
    val ids = Seq.fill(12000)(r.nextInt(7000).toLong) ++
      Seq.fill(200)(r.nextLong())
    val oneShot = new Bitmap64
    ids.foreach(oneShot.add)
    val shuffled = r.shuffle(ids)
    val parts = shuffled.grouped(1700).map { chunk =>
      val b = new Bitmap64
      chunk.foreach(b.add)
      b
    }.toSeq
    val merged = parts.reduce((a, b) => a.or(b))
    assert(java.util.Arrays.equals(oneShot.serialize, merged.serialize))
    // and through the stored-partial route (bytes → merge → bytes)
    val viaBytes = parts.map(_.serialize)
      .foldLeft(new Bitmap64)((acc, b) => acc.or(Bitmap64.deserialize(b)))
    assert(java.util.Arrays.equals(oneShot.serialize, viaBytes.serialize))
  }

  test("or() never aliases the right side's containers") {
    val a = new Bitmap64
    val b = new Bitmap64
    b.add(5L)
    b.add(1L << 40)
    a.or(b)
    a.add(6L) // would leak into b if the container were shared
    assert(!b.contains(6L))
    assert(b.cardinality == 2L)
  }

  test("aggregators equal count(DISTINCT) exactly, any partition layout") {
    val e = Tables(spark, sf, "events")
    val direct = udaf(BitmapDistinct)
    val partial = udaf(BitmapPartial)
    val mergeCt = udaf(BitmapMergeCount)
    val truth = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("uv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val got = e.repartition(parts)
        .groupBy(col("event_type"))
        .agg(direct(col("user_id")).as("uv"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == truth, s"direct bitmap != exact at $parts parts")
    }
    // stored-partial route: fine partials (type, day) merged up to
    // (type) must count the UNION of ids — idempotent across days
    val day = graft.functions.Fns.curDate(
      graft.functions.Fns.nsToSec(col("ts")))
    val stored = e.groupBy(col("event_type"), day.as("d"))
      .agg(partial(col("user_id")).as("bm"))
    val reagg = stored.groupBy(col("event_type"))
      .agg(mergeCt(col("bm")).as("uv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reagg == truth, "merged partials != exact")
    // partial-to-partial re-aggregation keeps the bytes canonical
    val mergePm = udaf(BitmapMergePartial)
    val coarse = stored.groupBy(col("event_type"))
      .agg(mergePm(col("bm")).as("bm"))
    val direct1 = e.groupBy(col("event_type"))
      .agg(partial(col("user_id")).as("bm"))
    val ja = coarse.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val jb = direct1.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(ja.keySet == jb.keySet)
    ja.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, jb(k)),
        s"coarse partial not bit-equal for $k")
    }
  }

  test("Graft.exactDistinct: integral columns only, refused at " +
      "analysis (never a silent undercount)") {
    import spark.implicits._
    val df = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("i", "s", "d")
    // integral widens fine and equals count(DISTINCT)
    val ok = df.agg(graft.api.Graft.exactDistinct(col("i"))).head
    assert(ok.getLong(0) == 2L)
    // DOUBLE would collide under a cast; STRING would null out — both
    // must refuse at analysis, not miscount
    for (c <- Seq("d", "s")) {
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(graft.api.Graft.exactDistinct(col(c))).collect()
      }
      assert(err.getMessage.contains("integral"), s"no refusal for $c")
    }
  }

  test("intersection is a faithful set op across container shapes; " +
      "andCardinality == |and|; dense results downgrade canonically") {
    val r = rnd(99)
    // left: one dense container (trips the bitset upgrade) + sparse
    // tails; right: overlapping dense + disjoint keys
    val left = (0 until 6000).map(_.toLong) ++
      Seq.fill(300)(1L << 40 | r.nextInt(500).toLong)
    val right = (3000 until 9000).map(_.toLong) ++
      Seq.fill(300)(1L << 41 | r.nextInt(500).toLong)
    val (la, rb) = (new Bitmap64, new Bitmap64)
    left.foreach(la.add)
    right.foreach(rb.add)
    val truth = left.toSet intersect right.toSet
    assert(la.andCardinality(rb) == truth.size.toLong)
    assert(rb.andCardinality(la) == truth.size.toLong)
    val inter = la.and(rb)
    assert(inter.cardinality == truth.size.toLong)
    truth.foreach(v => assert(inter.contains(v)))
    // canonical downgrade: the intersection's bytes equal a direct
    // build of the same set (bitset∩bitset result below 4096 entries
    // must come back as an ARRAY container)
    val direct = new Bitmap64
    truth.foreach(direct.add)
    assert(java.util.Arrays.equals(inter.serialize, direct.serialize),
      "intersection result not canonical")
    // operands untouched
    assert(la.cardinality == left.toSet.size.toLong)
    assert(rb.cardinality == right.toSet.size.toLong)
    // empty intersection
    val far = new Bitmap64
    far.add(1L << 50)
    assert(la.andCardinality(far) == 0L)
    assert(la.and(far).cardinality == 0L)
  }

  test("x24 overlap kernels: stored-partial intersection == the raw " +
      "pairwise join, and the segment build navigates") {
    val e = Tables(spark, sf, "events")
    // force the events summary registration, then check the segment
    // aggregate reads it (partial-to-partial navigation)
    val evDir = s"file:${operators.ScalePatterns.navEventsDir(spark, sf)}"
    val x24 = q("x24_bitmap_overlap")
    val leaves = x24.queryExecution.optimizedPlan.collectLeaves()
      .flatMap {
        case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
        case _ => Nil
      }.toSet
    assert(leaves.exists(_.startsWith(evDir)),
      s"x24 segments did not navigate: $leaves")
    assert(!leaves.contains(s"file:$sf/events.parquet"),
      s"x24 still scans the fact table: $leaves")
    // kernel truth vs a raw pairwise join
    val rows = x24.collect()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val sets = e.select(col("event_type"), col("user_id")).distinct()
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    for (a <- sets.keys; b <- sets.keys if a < b) {
      val r = byPair((a, b))
      assert(r.getLong(2) == sets(a).size.toLong, s"uv_a $a")
      assert(r.getLong(3) == sets(b).size.toLong, s"uv_b $b")
      assert(r.getLong(4) == (sets(a) intersect sets(b)).size.toLong,
        s"overlap $a-$b")
    }
    assert(rows.length == sets.size * (sets.size - 1) / 2)
  }

  test("null ids are skipped (count(DISTINCT)'s non-null contract)") {
    import spark.implicits._
    val df = Seq[(String, Option[Long])](
      ("a", Some(1L)), ("a", None), ("a", Some(2L)), ("b", None))
      .toDF("k", "id")
    val got = df.groupBy(col("k"))
      .agg(udaf(BitmapDistinct).apply(col("id")).as("uv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 0L))
  }
}
