package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level timing of the prefix-filtered n-gram Jaccard pipeline. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("ngram-profile", 32)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val sh = Dedup.shingles(docs, 3).persist()
      val nSh = sh.count()
      val t1 = System.nanoTime()
      val cand = Dedup.candidatesByPrefix(sh, 0.8).persist()
      val nCand = cand.count()
      val t2 = System.nanoTime()
      val nOut = Dedup.jaccardVerifySized(sh, cand, 0.8).count()
      val t3 = System.nanoTime()
      println(f"NGRAM r$round shingles=$nSh (${(t1-t0)/1e9}%.2f s) " +
        f"candidates=$nCand (${(t2-t1)/1e9}%.2f s) " +
        f"verified=$nOut (${(t3-t2)/1e9}%.2f s) total=${(t3-t0)/1e9}%.2f s")
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
