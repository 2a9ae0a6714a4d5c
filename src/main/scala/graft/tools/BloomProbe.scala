package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** decontaminateBloom win-regime probe: measures the quantity the
  * single-node wall clock hides — BYTES CROSSING THE EXCHANGE.
  *
  * Setup = the prefilter's target regime: a benchmark side too large to
  * broadcast (K-cloned sf0.1, broadcast disabled → shuffle join on the
  * shingle), corpus side K-cloned. Local[32] exchanges through memory /
  * local disk at GB/s, so wall time still favors the exact join — the
  * probe therefore reports, per variant: wall sec, total shuffle bytes
  * written, and the implied CROSSOVER exchange bandwidth
  *   bytes_saved / extra_seconds
  * — on a cluster whose effective per-node exchange throughput is BELOW
  * that, the prefilter wins. Also runs the exact join under Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` for comparison (the
  * heuristic twin of our explicit filter).
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 30
    val spark = GraftSession.local("bloom-probe", 32)
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text")))
      .reduce(_ unionByName _)
      .repartition(64).persist()
    val corpus = big.filter(col("doc_id") % 20 =!= 0)
    val bench = big.filter(col("doc_id") % 20 === 0)
    println(s"PROBE k=$k docs=${big.count()} bench=${bench.count()}")

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def run(name: String)(f: => Long): (Double, Long) = {
      graft.Housekeeping.release(spark)
      big.persist().count()
      Thread.sleep(2000) // drain listener events from setup jobs
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // drain listener events from this run
      val bytes = shuffleBytes.get()
      println(f"PROBE $name rows=$n sec=$sec%.1f shuffleMB=${bytes / 1e6}%.0f")
      (sec, bytes)
    }

    // the target regime: benchmark side NOT broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val (exSec, exBytes) = run("exact_noBroadcast")(
      Dedup.decontaminate(corpus, bench, n = 4).count())
    val (blSec, blBytes) = run("bloom_noBroadcast")(
      Dedup.decontaminateBloom(corpus, bench, n = 4).count())
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val (rtSec, rtBytes) = run("exact_runtimeBloom")(
      Dedup.decontaminate(corpus, bench, n = 4).count())
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")

    val saved = exBytes - blBytes
    val extra = blSec - exSec
    val crossoverMBps = if (extra > 0) saved / 1e6 / extra else Double.PositiveInfinity
    println(f"PROBE summary: exact $exSec%.1f s / ${exBytes / 1e6}%.0f MB; " +
      f"bloom $blSec%.1f s / ${blBytes / 1e6}%.0f MB " +
      f"(cut ${100.0 * saved / math.max(exBytes, 1)}%.0f%%); " +
      f"runtimeBloom $rtSec%.1f s / ${rtBytes / 1e6}%.0f MB; " +
      f"crossover exchange bandwidth ≈ $crossoverMBps%.0f MB/s/node")
    spark.stop()
  }
}
