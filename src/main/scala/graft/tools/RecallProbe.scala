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
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
