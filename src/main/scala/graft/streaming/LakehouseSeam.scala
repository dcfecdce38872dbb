package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The lakehouse swap seam for the dim/DWS stores (SURVEY §7.4's
  * designated substitution for the reference's HBase upsert/delete +
  * Doris partitioned sinks — HBaseSinkFunction.java:36-61,
  * FlinkSinkUtil.java:82-107).
  *
  * [[LakehouseTable]]/[[LakehouseMergeBuilder]] mirror the PUBLIC
  * io.delta.tables.DeltaTable surface (toDF / merge(source, cond) /
  * whenMatched…delete / whenMatched…updateAll / whenNotMatched…insertAll
  * / execute, plus time travel and vacuum) so that a deployment with
  * Delta (or, with a thin adapter, Iceberg's MERGE INTO) on the
  * classpath swaps by reimplementing THIS trait with the real builder —
  * every call site compiles unchanged. The zero-egress sandbox cannot
  * resolve the delta jars (build.sbt:5-7), so the shipped
  * implementation, [[ParquetLakehouseTable]], delegates to
  * [[VersionedParquetMergeSink]] — merge SEMANTICS proven equal to
  * `MERGE INTO` by the k5/k6/k7 oracles and PipelineSpec; the ACID
  * story (atomic commit protocol, concurrent-writer isolation) is what
  * the real format adds.
  *
  * The stand-in accepts exactly the CDC merge shape the reference's
  * sinks use:
  * {{{
  *   table.merge(batch, "target.id = source.id")
  *     .whenMatchedDelete("source.op = 'delete'")
  *     .whenMatchedUpdateAll()
  *     .whenNotMatchedInsertAll()
  *     .execute()
  * }}}
  * Any other clause combination throws UnsupportedOperationException
  * upfront (a real DeltaTable accepts arbitrary clauses — the seam is
  * deliberately narrower than the format, never wider, so code written
  * against it cannot silently mean something else after the swap). */
trait LakehouseTable {
  /** The current snapshot (DeltaTable.toDF). */
  def toDF(s: SparkSession): DataFrame

  /** Start a merge of `source` into this table (DeltaTable.merge).
    * `condition` must be the key-equality join `target.<key> =
    * source.<key>` on this table's declared key. */
  def merge(source: DataFrame, condition: String): LakehouseMergeBuilder

  /** Time travel (`VERSION AS OF`). */
  def versionAsOf(s: SparkSession, version: Long): DataFrame

  /** Retention (`VACUUM`): keep the newest `retain` versions, return
    * the versions removed. */
  def vacuum(retain: Int): Seq[Long]
}

/** The DeltaMergeBuilder-shaped clause chain. Implementations collect
  * clauses and apply them on [[execute]]. */
trait LakehouseMergeBuilder {
  def whenMatchedDelete(condition: String): LakehouseMergeBuilder
  def whenMatchedUpdateAll(): LakehouseMergeBuilder
  def whenNotMatchedInsertAll(): LakehouseMergeBuilder
  def execute(): Unit
}

/** The dependency-free implementation over the versioned-parquet store.
  *
  * @param storeDir    store root (one version dir per commit)
  * @param keyCol      entity key (the merge condition's key)
  * @param seqCol      total-order column (last-op-wins tie break)
  * @param opCol       op column, values in upsert|delete
  * @param payloadCols payload columns carried into the snapshot
  */
class ParquetLakehouseTable(storeDir: String, keyCol: String,
    seqCol: String, opCol: String, payloadCols: Seq[String])
    extends LakehouseTable {

  private[streaming] val sink =
    new VersionedParquetMergeSink(storeDir, keyCol, seqCol, opCol,
      payloadCols)

  override def toDF(s: SparkSession): DataFrame = sink.current(s)

  override def versionAsOf(s: SparkSession, version: Long): DataFrame = {
    // Strict version match: snapshotAt's as-of semantics ("latest
    // committed <= v") are WIDER than DeltaTable.versionAsOf, which
    // throws on a version that was never committed — and the seam
    // contract is strictly-narrower-never-wider, so a call that works
    // on the stand-in must not change meaning after the swap.
    require(sink.committedVersions.contains(version),
      s"version $version was never committed " +
        s"(committed: ${sink.committedVersions.sorted.mkString(",")})")
    sink.snapshotAt(s, version)
  }

  override def vacuum(retain: Int): Seq[Long] = sink.expireVersions(retain)

  override def merge(source: DataFrame, condition: String)
      : LakehouseMergeBuilder = {
    val want = s"target.$keyCol = source.$keyCol"
    require(condition.replaceAll("\\s+", " ").trim == want,
      s"the parquet stand-in merges on its declared key only: " +
        s"expected '$want', got '$condition'")
    new ParquetMergeBuilder(source)
  }

  private final class ParquetMergeBuilder(source: DataFrame)
      extends LakehouseMergeBuilder {
    private var deleteCond: Option[String] = None
    private var updateAll = false
    private var insertAll = false

    override def whenMatchedDelete(condition: String)
        : LakehouseMergeBuilder = {
      val want = s"source.$opCol = 'delete'"
      if (condition.replaceAll("\\s+", " ").trim != want)
        throw new UnsupportedOperationException(
          s"stand-in supports whenMatchedDelete(\"$want\") only (a real " +
            "DeltaTable accepts arbitrary conditions); got: " + condition)
      deleteCond = Some(condition); this
    }

    override def whenMatchedUpdateAll(): LakehouseMergeBuilder = {
      updateAll = true; this
    }

    override def whenNotMatchedInsertAll(): LakehouseMergeBuilder = {
      insertAll = true; this
    }

    /** Applies the clause chain. Only the full CDC shape (delete +
      * updateAll + insertAll) is accepted — it is exactly the
      * last-op-wins keyed merge [[VersionedParquetMergeSink.merge]]
      * implements, committed as the next version. */
    override def execute(): Unit = {
      if (deleteCond.isEmpty || !updateAll || !insertAll)
        throw new UnsupportedOperationException(
          "stand-in supports exactly whenMatchedDelete + " +
            "whenMatchedUpdateAll + whenNotMatchedInsertAll (the CDC " +
            "upsert/delete shape); a real DeltaTable accepts any subset")
      val next = sink.committedVersions.sorted.lastOption
        .map(_ + 1L).getOrElse(0L)
      sink.merge(source, next)
    }
  }
}
