package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard config: AQE on, UTC,
  * shuffle parallelism matched to local cores (not the 200 default —
  * on a real cluster this is sized to executors × cores instead).
  */
object GraftSession {
  def local(app: String, cores: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE (r14, measured negative and NOT enabled):
      // spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true
      // lets AQE coalesce shuffles inside cached plans — it fixed the
      // winnow family's 32-task tiny stages (dedup_winnow_rewrite
      // 9.8→7.1 s) but byte-based coalescing collapses CPU-heavy
      // small-byte cached stages to ONE task (sim_docs_tfidf's pair
      // dot-product job ran 3.95 s single-task; the gate ~2× slower).
      // Bytes are the wrong proxy for CPU-bound text work — default
      // kept.
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.parquet uses TIMESTAMP(NANOS); read as epoch-nanos
      // long and convert in Tables.normalizeTs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
