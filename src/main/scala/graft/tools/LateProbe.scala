package graft.tools

import org.apache.spark.sql.functions._

/** Empirical probe: which late rows does a watermarked streaming
  * aggregation DROP at the window-end boundary?
  *
  * Batch 0 sets the watermark to max(ts) - 1 min = 12:00:00 exactly.
  * Batch 1 then replays rows in windows ending 11:00 (< watermark),
  * 12:00 (== watermark) and 13:00 (> watermark). The output pins
  * whether the drop predicate is `end < W` or `end <= W`.
  */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("late-probe", 4)
    import spark.implicits._
    def ev(id: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), typ)
    val b0 = Seq(
      ev(1, "2026-01-01 10:30:00", "a"),
      ev(2, "2026-01-01 12:01:00", "a") // max ts → watermark 12:00:00
    ).toDF("event_id", "ts", "event_type")
    // middle batch: lets batch 2's LATE filter see the watermark set
    // after batch 0 (Spark filters batch N's late rows against the
    // watermark of batch N-1, i.e. the value computed after batch N-2)
    val b1 = Seq(ev(6, "2026-01-01 10:45:00", "mid"))
      .toDF("event_id", "ts", "event_type")
    val b2 = Seq(
      ev(3, "2026-01-01 10:15:00", "lt"), // window end 11:00 < W
      ev(4, "2026-01-01 11:15:00", "eq"), // window end 12:00 == W
      ev(5, "2026-01-01 12:15:00", "gt")  // window end 13:00 > W
    ).toDF("event_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft_lateprobe_")
      .toString
    graft.streaming.EventsStream.stageBatches(dir, b0, b1, b2)
    val out = graft.streaming.EventsStream.hourlyCountsStaged(spark, dir)
    out.orderBy("hour", "event_type").show(false)
    spark.stop()
  }
}
