package graft.tools

/** Write `.explain("formatted")` output for named SparkEntry queries to
  * `<outDir>/<query>_<tag>.txt` — the optimization-round evidence files
  * under plans/r13 (tag = before or after).
  * Usage: PlanDump <tag> <outDir> <q>... [dir via -Dgraft.plan.sf] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(tag, outDir, names @ _*) = args: @unchecked
    val sfDir = sys.props.getOrElse("graft.plan.sf", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.local("plan-dump", 8)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val plan =
        try {
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), plan)
      graft.Housekeeping.release(spark)
      println(s"dumped $n")
    }
    spark.stop()
  }
}
