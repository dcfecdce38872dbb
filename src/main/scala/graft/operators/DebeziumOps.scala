package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}
import graft.functions.Fns

/** The Debezium config-CDC direction (FIXTURES.md F2): the reference
  * captures its table_process_dim/dwd config tables through Flink CDC —
  * op ∈ {r,c,u,d}; d reads `before`, everything else reads `after`
  * (DimApp.java:197-227, DwdBaseDb.java:74-93,
  * Test01_FlinkCDC.java:34-37) — and folds the ops into a live config
  * snapshot that is broadcast to the data plane (J6).
  *
  * Rebuild: a Debezium-shaped op log is synthesized from the supplier
  * table (deterministic: each supplier emits r→u→(maybe d) ops keyed by
  * s_suppkey), serialized to JSON, parsed back via the explicit
  * [[EnvelopeOps.debeziumSchema]], payload selected per op, and folded
  * with last-op-wins into the snapshot — the exact state the reference
  * keeps in its broadcast MapState.
  *
  * Also covers P4's status-transition filters: the order-status
  * transition extractors (cancel 1001→1003, refund →1005) expressed as
  * envelope predicates over type/old/data
  * (DwdTradeOrderCancelDetail.java:35-43, DwdTradeOrderRefund.java:57-67).
  */
object DebeziumOps extends QueryModule {
  import Fns._

  private val payloadSchema = StructType(Seq(
    StructField("source_table", StringType),
    StructField("sink_table", StringType),
    StructField("sink_columns", StringType),
    StructField("sink_row_key", StringType)))

  /** Deterministic Debezium op log from supplier: every key gets a
    * read-snapshot op, odd keys get an update, keys %5==0 get a delete.
    * seq orders ops per key. */
  private def opLog(s: SparkSession, dir: String): DataFrame = {
    val su = Tables(s, dir, "supplier")
    def payload(cols: Column): Column = struct(
      concat(lit("table_"), col("s_suppkey")).as("source_table"),
      concat(lit("dim_"), col("s_suppkey")).as("sink_table"),
      cols.as("sink_columns"),
      lit("id").as("sink_row_key"))
    // build each op row as JSON text (the wire format)
    val reads = su.select(col("s_suppkey"), lit(1L).as("seq"),
      to_json(struct(lit("r").as("op"),
        payload(lit("id,name")).as("after"),
        (col("s_suppkey") * 1000 + 1).as("ts_ms"))).as("json"))
    val updates = su.filter(pmod(col("s_suppkey"), lit(2)) === 1)
      .select(col("s_suppkey"), lit(2L).as("seq"),
        to_json(struct(lit("u").as("op"),
          payload(lit("id,name")).as("before"),
          payload(lit("id,name,acct")).as("after"),
          (col("s_suppkey") * 1000 + 2).as("ts_ms"))).as("json"))
    val deletes = su.filter(pmod(col("s_suppkey"), lit(5)) === 0)
      .select(col("s_suppkey"), lit(3L).as("seq"),
        to_json(struct(lit("d").as("op"),
          payload(lit("id,name,acct")).as("before"),
          (col("s_suppkey") * 1000 + 3).as("ts_ms"))).as("json"))
    reads.unionByName(updates).unionByName(deletes)
  }

  /** cdc2: parse the Debezium log, pick before/after per op, fold
    * last-op-wins → live config snapshot (deleted keys dropped). */
  private def debeziumSnapshot(s: SparkSession, dir: String): DataFrame = {
    val parsed = opLog(s, dir).select(col("s_suppkey"), col("seq"),
      from_json(col("json"), EnvelopeOps.debeziumSchema(payloadSchema))
        .as("e"))
    val picked = parsed.select(col("s_suppkey"), col("seq"),
      col("e.op").as("op"),
      when(col("e.op") === "d", col("e.before"))
        .otherwise(col("e.after")).as("p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s_suppkey")).orderBy(col("seq").desc)
    picked.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("p.source_table").as("source_table"),
        col("p.sink_table").as("sink_table"),
        col("p.sink_columns").as("sink_columns"),
        size(split(col("p.sink_columns"), ",")).cast(LongType)
          .as("sink_col_ct"))
  }

  /** p4: status-transition extractors — cancel (1001→1003) / refund
    * (1002→1005) predicate filters over the SHARED parsed topic_db
    * envelope (one from_json for all DWD extractors, the reference's
    * one-topic-many-consumers layout; a per-extractor re-parse was ~6 s
    * of duplicated Jackson work at sf0.1). */
  private def statusTransitions(s: SparkSession, dir: String): DataFrame = {
    EnvelopeOps.parsedEnvelopes(s, dir)
      .filter(col("e.type") === "update")
      .withColumn("transition",
        when(col("e.old")("order_status") === "1001" &&
          col("e.data")("order_status") === "1003", "cancel")
          .when(col("e.old")("order_status") === "1002" &&
            col("e.data")("order_status") === "1005", "refund"))
      .filter(col("transition").isNotNull)
      .groupBy("transition")
      .agg(count(lit(1)).as("event_ct"),
        min(curDate(col("e.ts"))).as("first_date"),
        max(curDate(col("e.ts"))).as("last_date"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "s2_debezium_snapshot" -> debeziumSnapshot,
    "p4_status_transitions" -> statusTransitions)

  val oracles = Map(
    // semantics of op-fold: delete wins for %5==0; update wins for odd;
    // otherwise the read-snapshot row survives
    "s2_debezium_snapshot" ->
      """SELECT 'table_' || s_suppkey AS source_table,
        |       'dim_' || s_suppkey AS sink_table,
        |       CASE WHEN s_suppkey % 2 = 1 THEN 'id,name,acct'
        |            ELSE 'id,name' END AS sink_columns,
        |       CAST(CASE WHEN s_suppkey % 2 = 1 THEN 3 ELSE 2 END AS BIGINT) AS sink_col_ct
        |FROM supplier WHERE s_suppkey % 5 <> 0""".stripMargin,
    "p4_status_transitions" ->
      """WITH t AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'cancel'
        |              ELSE 'refund' END AS transition,
        |         strftime(o_orderdate, '%Y-%m-%d') AS d
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT transition, count(*) AS event_ct,
        |       min(d) AS first_date, max(d) AS last_date
        |FROM t GROUP BY 1""".stripMargin)
}
