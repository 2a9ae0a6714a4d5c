package graft.tools

/** Dump named SparkEntry queries to parquet (subset of Verify, for
  * targeted cross-SF oracle checks), plus an oracle_sql.json restricted
  * to those queries so tools/check_oracle.py runs on the subset.
  * Usage: QDump <sfDir> <outDir> <q>... */
object QDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names @ _*) = args: @unchecked
    val spark = graft.GraftSession.local("qdump", 16)
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      graft.Housekeeping.release(spark)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view
      .filterKeys(names.contains).toMap
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
