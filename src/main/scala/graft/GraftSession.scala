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
