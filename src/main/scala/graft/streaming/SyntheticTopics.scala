package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Memo for the synthesized Kafka-topic stand-ins (the DimApp/BaseDbApp
  * CDC envelope logs and the BaseLogApp log lines — FIXTURES.md F1/F2):
  * one persisted, eagerly-built frame per (session, dir, topic).
  *
  * Why a memo: these frames ARE the input topic, not query work — a
  * real deployment reads topic bytes that already exist; synthesizing
  * them from the base tables is fixture construction this sandbox pays
  * because it has no broker. Un-memoized, every envelope-family
  * consumer (g5/g6 routes, the k12 history twin, every spec and the
  * StreamBench replay) re-paid the JSON synthesis — the single largest
  * CPU item in the bench. The bands-memo treatment (build once, charge
  * the build to a visible prestage line, release at the family
  * boundary) matches how the 100 TB pipeline actually runs: the topic
  * is materialized once, upstream of every consumer. */
object SyntheticTopics {

  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  private[streaming] def memoized(topic: String, s: SparkSession,
      dir: String)(build: => DataFrame): DataFrame = {
    val key = (s, dir, topic)
    memo.get(key).getOrElse {
      // TrieMap.getOrElseUpdate is not atomic for the builder: under the
      // concurrent 12-app topology two first readers can both build and
      // persist; the losing frame would leak in the executor cache. Build
      // outside the map, then race on putIfAbsent and unpersist the loser.
      val df = build
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      memo.putIfAbsent(key, df) match {
        case Some(winner) => df.unpersist(false); winner
        case None =>
          df.count() // eager: build cost lands on the prestage line (or
          df         // the first consumer when un-prestaged), never
      }            // mid-family
    }
  }

  def release(): Unit = {
    memo.values.foreach(_.unpersist(false))
    memo.clear()
  }
}
