package graft.tools

import org.apache.spark.sql.functions._

/** Empirical probe: which windows does an APPEND-mode watermarked
  * aggregation EMIT by end-of-stream under AvailableNow?
  *
  * Batch 0's max ts sets the watermark to 12:00:00; batches 1/2 add
  * rows in windows ending 11:00 (< W), 12:00 (== W) and 13:00 (> W),
  * and batch 2's max ts would advance the watermark further IF the
  * final (possibly empty) micro-batch applies it. The output pins
  * (a) the emit predicate at the boundary (end < W vs end <= W) and
  * (b) whether the post-final-batch watermark finalizes more windows
  * before the query stops.
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("append-probe", 4)
    import spark.implicits._
    def ev(id: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), typ)
    val b0 = Seq(
      ev(1, "2026-01-01 10:30:00", "a"),
      ev(2, "2026-01-01 12:01:00", "a") // max ts → watermark 12:00:00
    ).toDF("event_id", "ts", "event_type")
    val b1 = Seq(ev(6, "2026-01-01 10:45:00", "mid"))
      .toDF("event_id", "ts", "event_type")
    val b2 = Seq(
      ev(3, "2026-01-01 10:15:00", "lt"), // window end 11:00 < W
      ev(4, "2026-01-01 11:15:00", "eq"), // window end 12:00 == W
      ev(5, "2026-01-01 12:15:00", "gt"), // window end 13:00 > W
      ev(7, "2026-01-01 14:30:00", "hi")  // would advance W to 14:29
    ).toDF("event_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft_appendprobe_")
      .toString
    graft.streaming.EventsStream.stageBatches(dir, b0, b1, b2)
    val schema = spark.read.parquet(s"$dir/b00.parquet").schema
    val out = graft.streaming.EventsStream.runToMemoryProbe(spark, s =>
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "b*.parquet")
        .parquet(dir)
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("hour"),
          col("event_type"), col("n_events")))
    out.orderBy("hour", "event_type").show(false)
    spark.stop()
  }
}
