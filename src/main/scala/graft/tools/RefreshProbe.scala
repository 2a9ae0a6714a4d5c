package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Relational

/** Artifact-refresh vs two-snapshot-refresh cost probe (round-8
  * verdict #3's "old-snapshot scan eliminated" evidence): on the sf0.1
  * events table — optionally cloned K× into disjoint shifted-id,
  * shifted-day copies — times [[Relational.incrementalRefresh]] (reads
  * BOTH snapshots: fingerprints + the unchanged-days aggregate come
  * from a full old-snapshot scan) against
  * [[Relational.incrementalRefreshFromArtifact]] (the old snapshot's
  * entire contribution is the |days|-sized stored artifact; only the
  * new snapshot is scanned). The artifact build itself is timed
  * separately — it is the PREVIOUS night's job, not part of the
  * nightly refresh cost. Asserts both refresh forms emit identical
  * rows.
  */
object RefreshProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("refresh-probe", 32)
    val k = if (args.nonEmpty) args(0).toInt else 1
    val dir = "/root/testdata/sf0.1"
    val ev0 = Tables.load(spark, dir, "events")
    val ev = (0 until k).map(i =>
        ev0.select((col("event_id") + lit(i * 1000000000L))
            .as("event_id"),
          col("user_id"), col("event_type"),
          (col("ts") + expr(s"INTERVAL ${i * 40} DAYS")).as("ts"),
          col("value")))
      .reduce(_ unionAll _).repartition(32).persist()
    ev.count()
    val rowCols = Seq("event_id", "user_id", "event_type")
    // the cutoff rides the LAST clone's tail: history (the old
    // snapshot) grows with K while the dirty delta stays fixed-size —
    // the nightly-refresh reality the probe is about
    val cutoffMicros = 1706616000000000L +
      (k - 1) * 40L * 86400L * 1000000L
    val oldDf = ev.filter(expr(s"unix_micros(ts) < ${cutoffMicros}L"))
    val art0 = java.nio.file.Files
      .createTempDirectory("graft_refresh_a").toString
    val art1 = java.nio.file.Files
      .createTempDirectory("graft_refresh_b").toString
    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      graft.Housekeeping.release(spark)
      ev.persist().count()
      n
    }
    time(s"k${k}_artifact_build")({
      Relational.rollupArtifactWrite(oldDf, art0, rowCols); 0L
    })
    val a = time(s"k${k}_refresh_two_snapshot")(
      Relational.incrementalRefresh(oldDf, ev, rowCols).count())
    val b = time(s"k${k}_refresh_from_artifact")(
      Relational.incrementalRefreshFromArtifact(ev, art0, art1, rowCols)
        .count())
    assert(a == b, s"row-count mismatch: $a vs $b")
    spark.stop()
  }
}
