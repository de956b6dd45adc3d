package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped streaming source abstraction (round-3 roadmap item):
  * the standard broker record contract — binary key/value plus
  * (topic, partition, offset, timestamp) metadata — decoupled from the
  * transport, so the parse/watermark/aggregate pipeline is testable
  * without a broker and swaps to the real connector by configuration.
  *
  * The sandbox has no kafka connector jar, so [[source]] is the
  * config-only wiring (same posture as sources/Jdbc: compile-checked
  * contract, zero-egress environment); everything downstream of the
  * record schema — [[parseEvents]] and the StreamingEvents operators —
  * runs identically over a MemoryStream or file stream in tests.
  *
  * Scale posture: records shard by (topic, partition); the JSON parse
  * is a narrow codegen'd map (`from_json`), and `startingOffsets` /
  * `maxOffsetsPerTrigger` bound per-micro-batch work. State stores of
  * downstream aggregations key on event-time windows, not offsets.
  */
object KafkaShaped {

  /** The broker record contract: what every transport must deliver. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** JSON payload schema for event records (the events table's shape
    * on the wire: epoch-millis event time).
    */
  val eventPayloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts_ms", LongType)))

  /** Real-connector wiring (requires the kafka connector on the
    * classpath and a reachable broker — not available in this
    * sandbox): same record schema as [[recordSchema]].
    */
  def source(spark: SparkSession, bootstrap: String, topic: String,
             maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()

  /** Record → typed event rows: decode the binary value as UTF-8 JSON,
    * reject unparseable payloads (from_json yields a NULL struct →
    * filtered, the standard poison-pill guard), keep the source
    * coordinates for lineage, and derive the event-time column the
    * watermark operators key on.
    */
  def parseEvents(records: DataFrame): DataFrame =
    records
      .select(col("partition"), col("offset"),
        from_json(col("value").cast("string"), eventPayloadSchema).as("e"))
      .filter(col("e").isNotNull && col("e.event_id").isNotNull)
      .select(col("e.event_id").as("event_id"), col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"), col("e.value").as("value"),
        timestamp_millis(col("e.ts_ms")).as("ts"),
        col("partition"), col("offset"))
}
