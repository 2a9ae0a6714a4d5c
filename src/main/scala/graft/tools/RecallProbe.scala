package graft.tools

import org.apache.spark.sql.functions._

/** Measure lshTopK / ivfTopK recall@k vs bruteTopK on the testdata
  * embeddings — the evidence behind Round4Spec's recall floors. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("recall-probe", 16)
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val e = graft.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      val brute = graft.operators.Similarity.bruteTopK(q, e)
        .select("query_id", "neighbor_id").persist()
      val nb = brute.count()
      for ((name, df) <- Seq(
          "lsh" -> graft.operators.Similarity.lshTopK(q, e),
          "ivf" -> graft.operators.Similarity.ivfTopK(q, e),
          "ivf_trained" -> graft.operators.Similarity.ivfTopK(q, e,
            codebook = Some(graft.operators.Similarity.trainCodebook(e))))) {
        val hit = df.select("query_id", "neighbor_id")
          .join(brute, Seq("query_id", "neighbor_id")).count()
        println(f"RECALL $sf $name = ${hit.toDouble / nb}%.4f ($hit/$nb)")
      }
      brute.unpersist()
      // PQ ranks by L2, so its reference is the exact-L2 ranking —
      // which pqTopK itself produces when the shortlist is unbounded
      // (every candidate reaches the exact re-rank stage)
      val l2ref = graft.operators.Similarity
        .pqTopK(q, e, rerank = Int.MaxValue)
        .select("query_id", "neighbor_id").persist()
      val nl = l2ref.count()
      for (rr <- Seq(40, 160, 400)) {
        val pqHit = graft.operators.Similarity.pqTopK(q, e, rerank = rr)
          .select("query_id", "neighbor_id")
          .join(l2ref, Seq("query_id", "neighbor_id")).count()
        println(f"RECALL $sf pq(L2) rerank=$rr%-4d = " +
          f"${pqHit.toDouble / nl}%.4f ($pqHit/$nl)")
      }
      val ivfpqHit = graft.operators.Similarity.ivfPqTopK(q, e)
        .select("query_id", "neighbor_id")
        .join(l2ref, Seq("query_id", "neighbor_id")).count()
      println(f"RECALL $sf ivfpq(L2) = " +
        f"${ivfpqHit.toDouble / nl}%.4f ($ivfpqHit/$nl)")
      // residual-encoded IVFADC: same routing, per-list codebooks —
      // the accuracy-vs-raw-codes evidence
      val resHit = graft.operators.Similarity.ivfPqResTopK(q, e)
        .select("query_id", "neighbor_id")
        .join(l2ref, Seq("query_id", "neighbor_id")).count()
      println(f"RECALL $sf ivfpq_res(L2) = " +
        f"${resHit.toDouble / nl}%.4f ($resHit/$nl)")
      l2ref.unpersist()
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
