package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-over-round drift check on the two swap seams (round-8 verdict
  * #8): the day the sandbox gets the connector jars, swapping in the
  * real Kafka source / Delta table must be a BINDING swap — so each
  * round re-verifies that the seams still compile against and accept
  * the documented public-API shapes. PipelineSpec/StreamingSpec prove
  * the seams' SEMANTICS (merge == MERGE INTO, wire byte-equality);
  * this spec pins the SHAPES: the full 7-column Kafka connector wire
  * schema, the sink-input contract, the documented source-option
  * chain, and the one-expression Delta merge-builder idiom. */
class SeamShapeSpec extends SparkSuite {

  /** The exact wire schema `spark.readStream.format("kafka")` yields
    * (Structured Streaming + Kafka integration guide — fixed by the
    * connector, not by us). If the adapters ever stop accepting this
    * shape, the swap stops being a binding swap. */
  private val kafkaWireSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  test("kafka seam: adapters accept the full connector wire schema, " +
      "not just the key/value slice") {
    val env = """{"database":"gmall2024","table":"t","type":"insert",""" +
      """"ts":1000,"data":{"id":"7"}}"""
    val rows = java.util.Arrays.asList(
      Row("7".getBytes("UTF-8"), env.getBytes("UTF-8"), "topic_db",
        0, 42L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0))
    val wire = spark.createDataFrame(rows, kafkaWireSchema)
    // consumer half: the envelope string the app pipelines parse
    val got = graft.streaming.KafkaSeam.envelopeFromKafka(wire)
    assert(got.schema == StructType(Seq(
      StructField("envelope", StringType))))
    assert(got.head().getString(0) == env)
    // typed half: explicit-schema JSON lift off the same wire frame
    val typedSchema = StructType(Seq(StructField("database", StringType),
      StructField("table", StringType), StructField("ts", LongType)))
    val typed = graft.streaming.KafkaSeam.fromKafka(wire, typedSchema)
    assert(typed.columns.toSeq == Seq("database", "table", "ts"))
    assert(typed.head() == Row("gmall2024", "t", 1000L))
  }

  test("kafka seam: sink adapters emit exactly the shape the kafka " +
      "sink requires (key/value BINARY)") {
    import spark.implicits._
    val events = Seq((1L, "view", 2.5)).toDF("event_id", "event_type", "v")
    // shape = names + types (nullability is a value property, not part
    // of the sink's wire contract)
    def shapeOf(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.toSeq.map(f => (f.name, f.dataType))
    val wireShape = Seq("key" -> BinaryType, "value" -> BinaryType)
    val sinkDf = graft.streaming.KafkaSeam.toKafka(events, col("event_id"))
    assert(shapeOf(sinkDf) == wireShape,
      s"kafka sink input drifted: ${sinkDf.schema}")
    val envs = Seq("{\"a\":1}").toDF("envelope")
    val envSink = graft.streaming.KafkaSeam.envelopeToKafka(envs, lit("k"))
    assert(shapeOf(envSink) == wireShape)
    // the envelope body rides UNWRAPPED — byte-for-byte the topic_db
    // wire form Maxwell/Debezium publish
    assert(new String(envSink.head().getAs[Array[Byte]]("value"),
      "UTF-8") == "{\"a\":1}")
  }

  test("kafka seam: the documented source-option chain is accepted, " +
      "and the ONLY missing piece in this sandbox is the connector jar") {
    // S1's swap surface (FlinkSourceUtil.java:23-58 → the Spark Kafka
    // source): this exact chain is what replaces the file-stream seam
    val reader = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", "broker-1:9092")
      .option("subscribe", "topic_db")
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
    // no broker AND no connector jar here — load() must fail with
    // "source not found", NOT with an option/shape error: proof the
    // swap needs only the jar on the classpath
    val e = intercept[Exception] { reader.load() }
    val msg = Option(e.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("kafka") &&
      (msg.contains("Failed to find") || msg.contains("DATA_SOURCE") ||
        msg.toLowerCase.contains("provider")),
      s"expected missing-provider failure, got: $msg")
  }

  test("lakehouse seam: the one-expression DeltaTable merge idiom " +
      "compiles against the trait and executes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seam_lake").toString
    // bound by the TRAIT — a Delta deployment rebinds this one val
    val table: graft.streaming.LakehouseTable =
      new graft.streaming.ParquetLakehouseTable(dir, "id", "seq", "op",
        Seq("name"))
    // the exact fluent shape of io.delta.tables.DeltaMergeBuilder —
    // one expression, documented clause order; signature drift in any
    // trait method breaks THIS line at compile time
    table
      .merge(Seq((1L, "upsert", "a", 1L), (2L, "upsert", "b", 2L))
        .toDF("id", "op", "name", "seq"), "target.id = source.id")
      .whenMatchedDelete("source.op = 'delete'")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert(table.toDF(spark).select("id").as[Long].collect().toSet ==
      Set(1L, 2L))
    // time travel + vacuum complete the DeltaTable surface
    assert(table.versionAsOf(spark, 0L).count() == 2)
    assert(table.vacuum(1).isEmpty) // only one version: nothing to drop
  }
}
