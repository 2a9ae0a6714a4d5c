package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Price the kNN blocking trade (round-10): recall@10 vs scanned-pair
  * fraction for the sign-bucket LSH (8 bits + Hamming-1 probes) against
  * IVF routing at several (nCentroids, nProbe) settings, on the
  * testdata embeddings. Also reports the mutual-kNN graph size and the
  * min-label component convergence of the IVF-routed graph — the
  * evidence behind knnGraphMutualIvf's defaults and the
  * sim_knn_recall_ivf gate. Scanned fraction is recomputed here from
  * first principles (bucket/list membership joins), independent of the
  * operator internals.
  */
object IvfKnnProbe {

  private def recall(approx: DataFrame, brute: DataFrame,
                     nb: Long): Double = {
    val hit = approx.select("query_id", "neighbor_id")
      .join(brute, Seq("query_id", "neighbor_id")).count()
    hit.toDouble / nb
  }

  /** Candidate volume of the sign-bucket scheme: pairs (q, c) with
    * c.bucket in q's 9-probe set, self excluded. */
  private def lshVolume(spark: SparkSession, e: DataFrame,
                        q: DataFrame, nBits: Int = 8): Long = {
    def bucket(vec: org.apache.spark.sql.Column) =
      (0 until nBits).map { i =>
        when(get(vec, lit(i)) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    val nz = e.select(col("vec_id"), col("embedding"))
      .filter(Similarity.l2norm(col("embedding")) > 0)
    val cb = nz.select(col("vec_id"), bucket(col("embedding")).as("b"))
      .persist()
    val qb = cb.join(q.select("vec_id"), "vec_id")
      .select(col("vec_id").as("qid"),
        explode(array((col("b") +: (0 until nBits).map(i =>
          col("b").bitwiseXOR(lit(1 << i)))): _*)).as("b"))
    val n = qb.join(cb, "b").filter(col("vec_id") =!= col("qid")).count()
    cb.unpersist()
    n
  }

  /** Candidate volume of IVF routing: pairs (q, c) with c assigned to
    * one of q's nProbe nearest of the nCentroids lowest-id lists. */
  private def ivfVolume(e: DataFrame, q: DataFrame, nCentroids: Int,
                        nProbe: Int): Long = {
    val nz = Similarity.withNorm(e).filter(col("norm") > 0)
    val cent = nz.orderBy(col("vec_id").asc).limit(nCentroids)
      .select(col("vec_id").as("cid"), col("vec").as("cv"),
        col("norm").as("cn"))
    def cos = Similarity.dot(col("vec"), col("cv")) /
      (col("norm") * col("cn"))
    val assign = nz.crossJoin(broadcast(cent))
      .groupBy("vec_id")
      .agg(max(struct(cos.as("c"), (-col("cid")).as("n"))).as("m"))
      .select(col("vec_id"), (-col("m.n")).as("cid")).persist()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("c").desc, col("cid").asc)
    val probes = nz.join(q.select("vec_id"), "vec_id")
      .crossJoin(broadcast(cent))
      .select(col("vec_id").as("qid"), col("cid"), cos.as("c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= nProbe)
      .select("qid", "cid")
    val n = probes.join(assign, "cid")
      .filter(col("vec_id") =!= col("qid")).count()
    assign.unpersist()
    n
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("ivfknn-probe", 16)
    for (sf <- args.headOption.map(Seq(_)).getOrElse(
        Seq("sf0.01", "sf0.1"))) {
      val e = graft.Tables.load(spark, s"/root/testdata/$sf",
        "embeddings").persist()
      val q = e.filter(col("vec_id") % 10 === 0)
      val nAll = e.count()
      val nQ = q.count()
      val denom = nQ.toDouble * (nAll - 1)
      val brute = Similarity.bruteTopK(q, e)
        .select("query_id", "neighbor_id").persist()
      val nb = brute.count()
      val lv = lshVolume(spark, e, q)
      println(f"PROBE $sf lsh(8)          recall=" +
        f"${recall(Similarity.lshTopK(q, e), brute, nb)}%.4f " +
        f"scanned=${lv / denom}%.4f")
      for ((nc, np) <- Seq((16, 4), (64, 4), (64, 8), (128, 8))) {
        val vol = ivfVolume(e, q, nc, np)
        val r = recall(Similarity.ivfTopK(q, e, 10, nc, np), brute, nb)
        println(f"PROBE $sf ivf($nc%3d,$np)      recall=$r%.4f " +
          f"scanned=${vol / denom}%.4f")
      }
      brute.unpersist()
      // graph comparison at the gate's k: edge counts + convergence
      for ((name, g) <- Seq(
          "lsh" -> Similarity.knnGraphMutual(e, k = 2),
          "ivf" -> Similarity.knnGraphMutualIvf(e, k = 2))) {
        println(s"PROBE $sf graph_$name k=2 edges=${g.count()}")
      }
      graft.Housekeeping.release(spark)
      e.unpersist()
    }
    spark.stop()
  }
}
