package graft.tools

/** Throwaway: time one SparkEntry query in isolation (3 runs). */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local("one-query", cpus)
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"ONE $name run$i = ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
