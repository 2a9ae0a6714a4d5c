package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Queue-shaped streaming ingestion behind one interface — the swap
  * point between a real Kafka cluster and the in-repo testable
  * file-log implementation.
  *
  * The wire schema is exactly the Kafka connector's canonical
  * projection — (key binary, value binary, topic string, partition
  * int, offset long, ts timestamp) — so consumer ETL written against
  * [[QueueSource]] runs unchanged on either implementation. This
  * container has no broker (and no kafka connector jar on the
  * classpath), so [[KafkaQueueSource]] is the documented production
  * wiring — constructible, never gated here — while
  * [[FileQueueSource]] replays a deterministic partitioned log staged
  * on disk by [[QueueLog.stage]] with the same schema, which is what
  * the oracle-gated consumer query runs on.
  */
trait QueueSource {
  /** The streaming frame in the Kafka wire schema. */
  def load(spark: SparkSession): DataFrame
}

/** Production wiring: the stock Spark-Kafka connector projected onto
  * the wire schema. `format("kafka")` resolves at runtime, so this
  * compiles without the connector jar; calling [[load]] without it (or
  * a broker) fails — by design, it exists so a deployment only swaps
  * the [[QueueSource]] value, not the consumer code.
  */
final case class KafkaQueueSource(bootstrapServers: String,
                                  topic: String,
                                  startingOffsets: String = "earliest")
    extends QueueSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("key"), col("value"), col("topic"), col("partition"),
        col("offset"), col("timestamp").as("ts"))
}

/** Test/replay wiring: a parquet directory staged by [[QueueLog.stage]]
  * read back as a file stream in the wire schema. */
final case class FileQueueSource(dir: String) extends QueueSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.schema(QueueLog.WireSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
}

/** Staging + consumption of the deterministic file-backed queue log. */
object QueueLog {

  /** The Kafka connector's canonical column set. */
  val WireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("ts", TimestampType)))

  val NumPartitions = 4

  /** md5-bucket partitioner over the record key (invariant: every
    * bucketing decision an oracle must reproduce derives from md5 —
    * Kafka's own murmur2 partitioner is not cross-engine replayable,
    * and WHICH partitioner produced a log never matters to a consumer).
    */
  private def mdPartition(key: Column): Column =
    (conv(substring(md5(key), 1, 4), 16, 10).cast("long")
      % NumPartitions).cast("int")

  /** Serialize the events table into the wire-schema log: key =
    * user_id bytes, value = a JSON blob of the event (ts as epoch µs —
    * integer-clean across engines), partition = md5 bucket of the key,
    * offset = dense (ts asc, event_id asc) position within the
    * partition.
    *
    * The per-partition offset window is TEST STAGING ONLY: a real log's
    * offsets are assigned by the broker as records arrive — no engine
    * ever computes them — so the window's full-data shuffle is not a
    * production path and does not need a scale story. One file per
    * partition, mirroring topic-partition layout.
    */
  def stage(spark: SparkSession, dir: String, stageDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.load(spark, dir, "events")
    val keyStr = col("user_id").cast("string")
    val byOffset = Window.partitionBy("partition")
      .orderBy(col("ets").asc, col("event_id").asc)
    val log = ev
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").as("v"), col("ts").as("ets"),
        mdPartition(keyStr).as("partition"))
      .withColumn("offset", (row_number().over(byOffset) - 1).cast("long"))
      .select(
        keyStr.cast("binary").as("key"),
        to_json(struct(col("event_id"), col("user_id"),
          col("event_type"), col("v").as("value"),
          unix_micros(col("ets")).as("tus"))).cast("binary").as("value"),
        lit("events").as("topic"),
        col("partition"), col("offset"), col("ets").as("ts"))
    log.repartition(NumPartitions, col("partition"))
      .write.mode("overwrite").parquet(stageDir)
  }

  /** The JSON layout inside `value` (see [[stage]]). */
  val ValueSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("tus", LongType)))

  /** The consumer: per-partition log stats computed from PARSED record
    * values — (partition, n_records, max_offset,
    * first_purchase_offset, n_purchases, sum_value). The last three
    * come from the deserialized JSON (string, long, and double fields),
    * so the gate fails if the value round-trip breaks anywhere;
    * max_offset / first_purchase_offset check the staged offset
    * assignment against the oracle's window replay. Runs as a real
    * stream over `source` (complete mode, AvailableNow) — the
    * production shape for a queue-backed ingest audit. No distinct
    * aggregation: streaming doesn't support exact count-distinct, and
    * the HLL alternative would break the exact oracle; the double sum
    * routes through DECIMAL(18,6) (the rel_events_hourly discipline).
    */
  def consume(spark: SparkSession, source: QueueSource): DataFrame =
    EventsStream.runToMemory(spark, s => source.load(s)
      .select(col("partition").cast("long").as("partition"),
        col("offset"),
        from_json(col("value").cast("string"), ValueSchema).as("r"))
      .groupBy("partition")
      .agg(count(lit(1)).as("n_records"),
        max(col("offset")).as("max_offset"),
        min(when(col("r.event_type") === "purchase", col("offset")))
          .as("first_purchase_offset"),
        sum(when(col("r.event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(col("r.value").cast("decimal(18,6)")).cast("double")
          .as("sum_value")),
      "queue", "complete")

  /** Stage + consume in one call (the gate query surface). */
  def etl(spark: SparkSession, dir: String, stageDir: String): DataFrame = {
    stage(spark, dir, stageDir)
    consume(spark, FileQueueSource(stageDir))
  }
}
