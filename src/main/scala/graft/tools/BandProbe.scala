package graft.tools

import org.apache.spark.sql.functions._

/** Recall/cost sweep for embeddingNearDup's SRP-LSH banding: for each
  * (threshold, bandMissProb) cell, the derived rows-per-band r, wall
  * time, emitted pairs, and pairs missed vs the exact all-pairs twin —
  * the measured basis for the BASELINE.md banding table and the
  * `bandMissProb` guidance in the Dedup scaladoc (production dedup at
  * t ≥ 0.85 affords a 1e-3 budget and gets real pruning; a 0.5
  * threshold forces r=2 where banding admits most pairs).
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("band-probe", 16)
    val sf = if (args.nonEmpty) args(0) else "sf0.1"
    val e = graft.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
    for (t <- Seq(0.5, 0.85)) {
      val exact = graft.operators.Dedup
        .embeddingNearDup(e, threshold = t, allPairs = true)
        .persist()
      val nExact = exact.count()
      for (miss <- Seq(1e-8, 1e-3)) {
        // same r derivation as the operator (kept in sync by hand —
        // the probe prints it so drift is visible)
        val p = 1.0 - math.acos(math.min(1.0, t)) / math.Pi
        val r = Seq(16, 8, 4, 2, 1).find { rr =>
          math.pow(1.0 - math.pow(p, rr), 64.0 / rr) < miss
        }.getOrElse(1)
        val t0 = System.nanoTime()
        val lsh = graft.operators.Dedup
          .embeddingNearDup(e, threshold = t, bandMissProb = miss)
          .persist()
        val nLsh = lsh.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val missed = exact.join(lsh, Seq("vec_a", "vec_b"), "left_anti")
          .count()
        println(f"BAND $sf t=$t%.2f miss=$miss%g r=$r " +
          f"sec=$sec%.2f pairs=$nLsh/$nExact missed=$missed")
        lsh.unpersist()
        graft.Housekeeping.release(spark)
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
