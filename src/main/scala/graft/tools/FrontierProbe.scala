package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall-vs-cost frontier sweep for the ANN family — the knob curves
  * behind BASELINE.md's defaults. For each configuration: wall-clock
  * seconds of the full top-k query (count-forced) and recall@10
  * against the family's reference ranking (bruteTopK's cosine order
  * for IVF, the exact-L2 order for the PQ family — each operator is
  * measured against the metric it ranks by). Run on sf0.1 (or pass a
  * sf dir name).
  */
object FrontierProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("frontier-probe", 32)
    val sf = if (args.nonEmpty) args(0) else "sf0.1"
    var e = graft.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      .persist()
    e.count()
    var q = e.filter(col("vec_id") % 50 === 0).persist()
    q.count()

    def timed(name: String, ref: DataFrame, nRef: Long)
             (f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f.select("query_id", "neighbor_id").persist()
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hit = df.join(ref, Seq("query_id", "neighbor_id")).count()
      println(f"FRONTIER $sf $name%-28s sec=$sec%6.2f " +
        f"recall=${hit.toDouble / nRef}%.4f")
      df.unpersist()
      // release() drops operator-local persists; re-pin the shared
      // frames so the next config is not charged for the reload
      graft.Housekeeping.release(spark)
      e = e.persist(); e.count()
      q = q.persist(); q.count()
      ref.persist().count()
    }

    // cosine family: reference = brute cosine top-10 (timed itself
    // first — the frontier's exact-search anchor)
    val tB0 = System.nanoTime()
    val brute = Similarity.bruteTopK(q, e)
      .select("query_id", "neighbor_id").persist()
    val nb = brute.count()
    println(f"FRONTIER $sf brute(anchor) sec=${(System.nanoTime() - tB0) / 1e9}%6.2f recall=1.0000")
    for (np <- Seq(1, 2, 4, 8, 16))
      timed(s"ivf nProbe=$np", brute, nb)(
        Similarity.ivfTopK(q, e, nProbe = np))

    // L2 family: reference = exact L2 ranking (pqTopK with an
    // unbounded shortlist — every candidate reaches the exact re-rank)
    val l2ref = Similarity.pqTopK(q, e, rerank = Int.MaxValue)
      .select("query_id", "neighbor_id").persist()
    val nl = l2ref.count()
    for (rr <- Seq(40, 160, 400, 1000))
      timed(s"pq rerank=$rr", l2ref, nl)(
        Similarity.pqTopK(q, e, rerank = rr))
    for (np <- Seq(2, 4, 8); rr <- Seq(40, 160, 400))
      timed(s"ivfpq nProbe=$np rerank=$rr", l2ref, nl)(
        Similarity.ivfPqTopK(q, e, nProbe = np, rerank = rr))
    for (np <- Seq(4, 8); rr <- Seq(160, 400))
      timed(s"ivfpq_res nProbe=$np rerank=$rr", l2ref, nl)(
        Similarity.ivfPqResTopK(q, e, nProbe = np, rerank = rr))
    spark.stop()
  }
}
