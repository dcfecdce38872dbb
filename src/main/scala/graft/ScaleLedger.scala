package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExecSubqueryExpression, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.util.QueryExecutionListener

/** Cross-scale growth ledger — the last leg of the 100 TB claim that
  * neither [[PlanBudget]] (plan SHAPE) nor [[TimeBudget]] (sf0.001
  * wall time) can see: per query, the shuffle records/bytes the
  * EXECUTED plan actually moved at two data scales (sf0.01 and sf0.1,
  * a 10× input step), recorded in SCALE_LEDGER.tsv and enforced by
  * PerfSpec.
  *
  * Why: a candidate-pair explosion inside a perfectly legal bucket
  * join — the classic LSH/near-dup failure mode — keeps the plan
  * shape (one equi-join Exchange) and the small-scale timing intact,
  * and only shows up as superlinear WORK growth. The guard here: a
  * query is flagged when its big-scale shuffle-record count exceeds
  * [[maxGrowthFactor]] × the 10× input growth × its small-scale
  * count (and clears an absolute floor, so metadata-sized queries
  * whose 50-row shuffles jitter 20× never false-positive).
  *
  * Measurement is the executed plan's own SQLMetrics — no listener
  * races, no sampling: the post-run [[QueryExecution]] is captured
  * through the public [[QueryExecutionListener]] hook, and the walk
  * descends AQE stages, reused exchanges (deduped by accumulator id,
  * so a ReusedExchange never double-counts), executed subquery plans
  * (DPP), and memoized cache builds (an [[InMemoryTableScanExec]]
  * consumer carries its family build's metrics — deliberate: a
  * quadratic BUILD flags every consumer). Regenerate per round:
  * `sbt "runMain graft.ScaleLedger"` (≈ one bench run per scale). */
object ScaleLedger {

  /** Input rows grow 10× from sf0.01 to sf0.1 (TESTDATA.md). */
  val inputRatio = 10.0

  /** Tolerated superlinearity: big/small shuffle records may reach
    * maxGrowthFactor × the allowed growth base before flagging. 1.3
    * absorbs benign tails (distinct-gram vocabularies, band-bucket
    * jitter) while a genuine quadratic (100×) is far outside. */
  val maxGrowthFactor = 1.3

  /** Queries whose big-scale shuffle stays under this record count are
    * never flagged: at 20k records the absolute work is trivial and
    * ratios of tiny numbers are noise, not scaling evidence. */
  val recordFloor = 20000L

  /** Recompute the flag PerfSpec asserts from a ledger row's numbers
    * (never trust a stored verdict column). The growth allowance is
    * OUTPUT-SENSITIVE: max(input growth, output-row growth) — a
    * pair-enumeration query (contamination pairs, near-dup audits)
    * cannot shuffle fewer records than the result it must produce, so
    * work that tracks a legitimately-superlinear OUTPUT is optimal,
    * not sick (c5 at sf0.1: 3 → 484 true contaminated pairs across a
    * 10× input step — its 104× shuffle growth is the output, not a
    * bug). What still flags: shuffle growing past both the input and
    * the output — quadratic INTERMEDIATE work hidden behind a small
    * result, the mega-cluster candidate explosion this ledger caught
    * (and [[graft.operators.DedupOps.bucketCliqueCap]] now bounds) on
    * its first round-8 run. */
  def flagged(recSmall: Long, recBig: Long, outSmall: Long,
      outBig: Long): Boolean = {
    val outGrowth = outBig.toDouble / math.max(1L, outSmall)
    recBig > recordFloor &&
      recBig.toDouble / math.max(1L, recSmall) >
        maxGrowthFactor * math.max(inputRatio, outGrowth)
  }

  /** Captures the QueryExecution of the next action while armed. The
    * listener bus delivery is async — readers poll [[last]]. */
  private final class Capture extends QueryExecutionListener {
    val last = new AtomicReference[QueryExecution](null)
    @volatile var armed = false
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = if (armed) last.set(qe)
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Every executed node reachable from `p`: through finalized AQE
    * plans, materialized query stages, expression-embedded subquery
    * plans (scalar + DPP InSubquery), and cached-relation builds. */
  private def flat(p: SparkPlan): Seq[SparkPlan] = {
    val own = p match {
      case a: AdaptiveSparkPlanExec => p +: flat(a.executedPlan)
      case q: QueryStageExec => p +: flat(q.plan)
      case im: InMemoryTableScanExec => p +: flat(im.relation.cachedPlan)
      case _ => p +: p.children.flatMap(flat)
    }
    own ++ p.expressions.flatMap(_.collect {
      case s: ExecSubqueryExpression => flat(s.plan)
    }.flatten)
  }

  /** (shuffle records written, shuffle bytes written, output rows)
    * of an executed plan, each metric accumulator counted once
    * (ReusedExchange shares its original's accumulators). Output rows
    * come from the first row-tracking operator in pre-order — the one
    * nearest the sink — which is the result cardinality the
    * output-sensitive growth allowance needs. */
  def shuffleTotals(qe: QueryExecution): (Long, Long, Long) = {
    val nodes = flat(qe.executedPlan)
    val seen = scala.collection.mutable.Set.empty[Long]
    var rec = 0L
    var bytes = 0L
    nodes.foreach {
      case se: ShuffleExchangeLike =>
        se.metrics.get("shuffleRecordsWritten").foreach { m =>
          if (seen.add(m.id)) rec += m.value
        }
        se.metrics.get("shuffleBytesWritten").foreach { m =>
          if (seen.add(m.id)) bytes += m.value
        }
      case _ => ()
    }
    val outRows = nodes
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .headOption.getOrElse(0L)
    (rec, bytes, outRows)
  }

  private def measureScale(spark: SparkSession, cap: Capture,
      dir: String, names: Seq[String]): Map[String, (Long, Long, Long)] = {
    Prestage.stages.foreach { case (_, gate, run) =>
      if (names.exists(gate)) run(spark, dir)
    }
    names.map { name =>
      // construction-time jobs (eager checkpoints, planning probes) run
      // un-armed: the ledger measures the query's EXECUTION
      val df = SparkEntry.queries(name)(spark, dir)
      cap.last.set(null)
      cap.armed = true
      try {
        df.write.format("noop").mode("overwrite").save()
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var qe = cap.last.get()
        while (qe == null && System.nanoTime() < deadline) {
          Thread.sleep(20)
          qe = cap.last.get()
        }
        require(qe != null, s"no QueryExecution captured for $name")
        name -> shuffleTotals(qe)
      } finally cap.armed = false
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.01")
    val big = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(2).getOrElse("SCALE_LEDGER.tsv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Verify.session(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val cap = new Capture
    spark.listenerManager.register(cap)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val sm = measureScale(spark, cap, small, names)
    // release family memos between scales so the big-scale pass
    // rebuilds (and therefore re-measures) its own intermediates
    Seq(operators.CurationOps, operators.DedupOps, operators.EnvelopeOps,
      operators.VectorOps, operators.ScalePatterns).foreach(_.release())
    val bg = measureScale(spark, cap, big, names)
    val rows = names.map { n =>
      val (rs, bs, os) = sm(n)
      val (rb, bb, ob) = bg(n)
      val ratio = rb.toDouble / math.max(1L, rs)
      "%s\t%d\t%d\t%d\t%d\t%d\t%d\t%.3f\t%s".formatLocal(
        java.util.Locale.ROOT, n, rs, rb, os, ob, bs, bb, ratio,
        if (flagged(rs, rb, os, ob)) "FLAG" else "ok")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      "# query\trec_small\trec_big\tout_small\tout_big" +
        "\tbytes_small\tbytes_big\tgrowth\tverdict - generated by " +
        "graft.ScaleLedger; enforced by PerfSpec (flag = shuffle " +
        s"records grew >${maxGrowthFactor}x max(${inputRatio.toInt}x " +
        "input step, output-row growth) above the " +
        s"$recordFloor-record floor)\n" +
        rows.mkString("", "\n", "\n"))
    println(s"wrote $out (${rows.size} queries, " +
      s"${rows.count(_.endsWith("FLAG"))} flagged)")
    spark.stop()
  }
}
