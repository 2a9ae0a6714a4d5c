package graft.tools

/** Throwaway: repeated runs of Bench's calibration job to stamp
  * Bench.CalibrationRefSec. */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("cal-probe", 32)
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("sum(sqrt(id * 1.0) * sin(id * 1.0)) AS s").collect()
      println(f"CAL run$i = ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
