package graft.tools
/** Throwaway: run one SparkEntry query with an extra runtime conf
  * (name=value) — A/B aid for runtime-settable SQL confs. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val confKv = args(1).split("=", 2)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local("conf-probe", 32)
    spark.conf.set(confKv(0), confKv(1))
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"CONF $name run$i = ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
