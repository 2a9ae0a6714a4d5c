package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: the purity-vs-coverage FRONTIER of the IVF-routed
  * density clustering (round-10 verdict #2 — move past the single
  * 8-of-128/k=2 operating point): sweep k ∈ {2, 3} × nProbe ∈
  * {8, 16, 32} and measure, per point,
  *  - clusters / members / size-weighted majority-label purity /
  *    clustered coverage (the ClusterProbe metrics),
  *  - fixpoint rounds to convergence (the twin-unroll budget), and
  *  - the mutual-edge quality the blocking feeds the clustering:
  *    edge count, same-label fraction, mean exact cosine (the verify
  *    tail's re-attached cosine — edges added by a wider probe set
  *    are only worth their exactness).
  * Results table in BASELINE.md; the gate re-pins at the chosen point.
  */
object IvfFrontierProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local("ivf-frontier-probe", 32)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").persist()
    val total = emb.count()
    val lbl = emb.select(col("vec_id"), col("label"))
    for (k <- Seq(2, 3); nProbe <- Seq(8, 16, 32)) {
      val g = graft.operators.Similarity
        .knnGraphMutualIvf(emb, k = k, nCentroids = 128, nProbe = nProbe)
        .persist()
      val eq = g
        .join(lbl.select(col("vec_id").as("u"), col("label").as("lu")), "u")
        .join(lbl.select(col("vec_id").as("v"), col("label").as("lv")), "v")
        .agg(count(lit(1)).as("n"),
          avg(when(col("lu") === col("lv"), 1.0).otherwise(0.0)).as("sl"),
          avg(col("cos")).as("mc")).collect()(0)
      val comp = graft.operators.Similarity
        .knnComponentsIvf(emb, k = k, nCentroids = 128, nProbe = nProbe,
          maxRounds = 30).persist()
      val rounds = comp.select(max(col("rounds"))).collect()(0).getLong(0)
      val per = comp.join(lbl, "vec_id")
        .groupBy("component", "label").agg(count(lit(1)).as("c"))
        .groupBy("component")
        .agg(sum(col("c")).as("n"), max(col("c")).as("maj"))
      val row = per.agg(count(lit(1)).as("clusters"),
        sum(col("n")).as("members"),
        (sum(col("maj")) / sum(col("n"))).as("purity")).collect()(0)
      println(f"PROBE k=$k nProbe=$nProbe edges=${eq.getLong(0)} " +
        f"edge_same_label=${eq.getDouble(1)}%.3f " +
        f"edge_mean_cos=${eq.getDouble(2)}%.3f " +
        f"clusters=${row.getLong(0)} members=${row.getLong(1)} " +
        f"purity=${row.getDouble(2)}%.3f " +
        f"coverage=${row.getLong(1).toDouble / total}%.3f " +
        f"rounds=$rounds")
      g.unpersist(); comp.unpersist()
    }
    spark.stop()
  }
}
