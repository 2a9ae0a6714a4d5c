package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Quiet-machine seconds for the calibration job (recorded alongside
    * BASELINE.md's bench table; re-stamp when the constant or hardware
    * changes). */
  val CalibrationRefSec: Double = 1.9

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Force full materialization of every query (count() lets Catalyst
    // prune projections a user would actually consume).
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      Housekeeping.release(spark)
      // a failed query must not look FAST — surface it as a penalty
      if (ok) dt else 9999.0
    }

    // Machine-load sentinel: a fixed CPU-bound job (no I/O, no shuffle,
    // SF-independent) timed against a recorded quiet-machine constant.
    // A contended run — the cause of the BENCH_r02 2×-regression
    // artifact — then self-identifies via load_ratio >> 1 instead of
    // masquerading as a code regression. Run AFTER warmup, twice,
    // best-of-2 (same methodology as the queries).
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, cpus.toInt)
        .selectExpr("sum(sqrt(id * 1.0) * sin(id * 1.0)) AS s")
        .collect()
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup on the smallest sf so the first measured query
    // isn't charged for JIT + first-job setup.
    val warmDir = "/root/testdata/sf0.001"
    for (name <- Seq("q6_tfidf", "rel_top_customers", "sim_topk_brute"))
      SparkEntry.queries.get(name).foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }

    // the calibration expression needs its OWN JIT warmup (measured:
    // ~10 s first two runs, ~2 s steady-state) — one untimed run, then
    // best-of-2 timed, so the sentinel reads machine load, not JIT tiering
    calibrate()
    val calSec = math.min(calibrate(), calibrate())

    // best-of-2: one repeat absorbs residual JIT/page-cache variance so
    // round-over-round comparisons track plan changes, not noise
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) => name -> math.min(run(name, fn), run(name, fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // CalibrationRefSec: quiet-machine constant recorded in BASELINE.md
    // at 32 cores; the job is CPU-bound and embarrassingly parallel, so
    // the expected time scales as 32/cores when SPARK_GRAFT_CPUS
    // overrides the default. load_ratio ≈ 1 on an idle box, >> 1 under
    // external contention.
    val refSec = CalibrationRefSec * 32.0 / cpus.toInt
    val loadRatio = calSec / refSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","calibration_sec":$calSec,"calibration_ref_sec":$refSec,"load_ratio":$loadRatio}""")
    spark.stop()
  }
}
