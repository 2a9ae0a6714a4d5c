package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Quiet-machine seconds for the calibration job (recorded alongside
    * BASELINE.md's bench table; re-stamp when the constant or hardware
    * changes). */
  val CalibrationRefSec: Double = 1.9

  /** Per-query baselines stamped from BASELINE.md's bench table (sf0.1,
    * local[32], best-of-2, quiet machine). The bench emits each query's
    * ratio vs this map and a `regressions` list at >1.3× — per-query
    * drifts self-identify in the JSON the way load self-identifies via
    * the calibration sentinel. Queries absent here (added since the last
    * stamp) get no ratio; re-stamp together with BASELINE.md. */
  val BaselinePerQuery: Map[String, Double] = Map(
    "dedup_assign" -> 4.49, "dedup_decontam" -> 1.01,
    "dedup_embedding" -> 3.06, "dedup_exact" -> 0.52,
    "dedup_minhash_lsh" -> 2.32, "dedup_ngram_jaccard" -> 2.88,
    "dedup_simhash" -> 1.21, "mm_features" -> 0.25,
    "pipe_curate" -> 4.56, "q1_tokens" -> 0.41, "q2_dictionary" -> 0.56,
    "q3_task1" -> 0.50, "q4_tf" -> 0.77, "q5_idf" -> 0.83,
    "q6_tfidf" -> 1.18, "rel_anti_join" -> 0.25,
    "rel_approx_users" -> 0.72, "rel_asof_join" -> 0.89,
    "rel_cube" -> 0.61, "rel_event_props" -> 0.36,
    "rel_events_hourly" -> 0.49, "rel_order_history" -> 0.35,
    "rel_pricing_summary" -> 1.04, "rel_promo_revenue" -> 1.33,
    "rel_revenue_nation" -> 0.95, "rel_rollup" -> 0.40,
    "rel_scalar_funcs" -> 0.25, "rel_sessionize" -> 0.42,
    "rel_set_ops" -> 0.36, "rel_top_customers" -> 0.45,
    "rel_window_funcs" -> 0.37, "samp_cap" -> 0.36, "samp_hash" -> 0.19,
    "samp_mix" -> 0.49, "samp_split" -> 0.18, "samp_stratified" -> 0.21,
    "sim_label_eval" -> 0.70, "sim_quantize" -> 1.35,
    "sim_topk_brute" -> 0.53, "sim_topk_ivf" -> 0.99,
    "sim_topk_lsh" -> 0.64, "stream_dedup_pairs" -> 0.82,
    "stream_events_by_segment" -> 1.05, "stream_events_hourly" -> 1.12,
    "stream_events_sliding" -> 1.06, "stream_foreach_sink" -> 1.28,
    "stream_session_window" -> 1.49, "stream_stream_join" -> 3.07,
    "stream_user_counts" -> 1.01, "text_fingerprint" -> 0.70,
    "text_hash_embed" -> 0.92, "text_langid" -> 0.27,
    "text_lm_score" -> 1.70, "text_quality_flags" -> 0.28,
    "text_redact" -> 0.24, "text_repetition" -> 1.09,
    "text_stats" -> 0.53)

  /** Regression flag threshold on (measured / baseline). */
  val RegressionRatio: Double = 1.3

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
    // per-query baseline ratios + regression flags (>1.3×); drifts
    // self-identify in the bench JSON instead of waiting for a human
    // diff of BASELINE.md
    val ratios = results.flatMap { case (name, sec) =>
      BaselinePerQuery.get(name).map(b => name -> sec / b)
    }
    val ratioJson = ratios
      .map { case (k, r) => s"\"" + k + "\":" + f"$r%.2f" }
      .mkString("{", ",", "}")
    val regressions = ratios.filter(_._2 > RegressionRatio)
      .map { case (k, r) => s"\"" + k + "\":" + f"$r%.2f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","calibration_sec":$calSec,"calibration_ref_sec":$refSec,"load_ratio":$loadRatio,"baseline_ratio":$ratioJson,"regressions":$regressions}""")
    spark.stop()
  }
}
