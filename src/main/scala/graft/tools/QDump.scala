package graft.tools

/** Dump named SparkEntry queries to parquet (subset of Verify, for
  * targeted cross-SF oracle checks). Usage: QDump <sfDir> <outDir> <q>... */
object QDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names @ _*) = args: @unchecked
    val spark = graft.GraftSession.local("qdump", 16)
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
