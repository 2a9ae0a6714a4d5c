package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway: cluster QUALITY of the two kNN-components blockings —
  * majority-label purity (size-weighted) and clustered coverage of the
  * sign-bucket LSH arm vs the IVF-routed arm on the synthetic
  * embeddings' labels. The recall gates price how many TRUE neighbors
  * each blocking recovers; this prices what that does to the CLUSTERS
  * a semantic-dedup pass would act on. Results table in BASELINE.md.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local("cluster-probe", 32)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def purity(name: String, comp: DataFrame): Unit = {
      val j = comp.join(emb.select(col("vec_id"), col("label")),
        "vec_id")
      val per = j.groupBy("component", "label")
        .agg(count(lit(1)).as("c"))
        .groupBy("component")
        .agg(sum(col("c")).as("n"), max(col("c")).as("maj"))
      val row = per.agg(
        count(lit(1)).as("clusters"), sum(col("n")).as("members"),
        (sum(col("maj")) / sum(col("n"))).as("purity")).collect()(0)
      val total = emb.count()
      println(f"PROBE $name clusters=${row.getLong(0)} " +
        f"members=${row.getLong(1)} purity=${row.getDouble(2)}%.3f " +
        f"coverage=${row.getLong(1).toDouble / total}%.3f")
    }
    purity("lsh", graft.operators.Similarity.knnComponents(emb))
    purity("ivf", graft.operators.Similarity.knnComponentsIvf(emb))
    spark.stop()
  }
}
