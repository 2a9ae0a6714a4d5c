package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway: collapse QUALITY of the two semantic-dedup arms — the
  * centroid-bucket pairwise duel ([[graft.operators.Dedup.semanticDedupBest]])
  * vs the IVF-routed kNN-component duel
  * ([[graft.operators.Dedup.semanticDedupKnn]]) — against the EXACT
  * near-dup truth set (brute all-pairs cosine, tractable at probe
  * scale; the O(N²) cost the blockings exist to avoid). Per arm and
  * threshold:
  *   - n_drops: vectors collapsed away
  *   - resolved: truth pairs broken (at least one side dropped) — the
  *     dup pairs the arm actually FOUND, over the exact total
  *   - residual: truth pairs with both sides kept — what the blocking
  *     MISSED
  *   - false_drops: drops with NO kept truth-partner — content deleted
  *     although nothing within the threshold survives to represent it
  * Results table in BASELINE.md.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local("semdedup-probe", 32)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val quality = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("vec_id"), col("n_chars"))
    val nv = graft.operators.Similarity.withNorm(emb).persist()
    for (t <- Seq(0.4, 0.5)) {
      val a = nv.select(col("vec_id").as("u"), col("vec").as("va"),
        col("norm").as("na"))
      val b = nv.select(col("vec_id").as("v"), col("vec").as("vb"),
        col("norm").as("nb"))
      val truth = a.crossJoin(b)
        .filter(col("u") < col("v") &&
          graft.operators.Similarity.dot(col("va"), col("vb"))
            / nullif(col("na") * col("nb"), lit(0.0)) >= t)
        .select("u", "v").persist()
      val nTruth = truth.count()
      def eval(name: String, res: DataFrame): Unit = {
        val drops = res.filter(!col("keep")).select("vec_id").persist()
        val du = drops.select(col("vec_id").as("u"))
        val dv = drops.select(col("vec_id").as("v"))
        val resolved = truth.join(du, Seq("u"), "left_semi")
          .unionByName(truth.join(dv, Seq("v"), "left_semi"))
          .distinct().count()
        // a drop is justified if some truth-partner is KEPT (not
        // itself dropped): partner list minus drops, per drop
        val partners = truth.join(du, Seq("u"), "left_semi")
          .select(col("u").as("d"), col("v").as("p"))
          .unionByName(truth.join(dv, Seq("v"), "left_semi")
            .select(col("v").as("d"), col("u").as("p")))
        val justified = partners
          .join(drops.select(col("vec_id").as("p")), Seq("p"),
            "left_anti")
          .select("d").distinct()
        val nDrops = drops.count()
        val nJust = justified.count()
        println(f"PROBE t=$t $name n_drops=$nDrops " +
          f"resolved=$resolved/$nTruth residual=${nTruth - resolved} " +
          f"false_drops=${nDrops - nJust}" +
          f" (${if (nDrops == 0) 0.0 else (nDrops - nJust).toDouble / nDrops}%.2f)")
        drops.unpersist()
      }
      // candidate-pair cost of each blocking: Σ group_size² — the
      // rows its verify join must score (the at-scale axis: buckets
      // are O(N²/C), reciprocal-kNN components near-linear)
      def pairCost(res: DataFrame, grp: String): Long =
        res.groupBy(col(grp)).agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * col("n"))).collect()(0).getLong(0)
      val cent = graft.operators.Dedup
        .semanticDedupBest(emb, quality, threshold = t, qCol = "n_chars")
        .persist()
      val knn = graft.operators.Dedup
        .semanticDedupKnn(emb, quality, threshold = t, qCol = "n_chars")
        .persist()
      eval("centroid_duel", cent)
      println(s"PROBE t=$t centroid_duel pair_cost=${pairCost(cent, "cid")}")
      eval("ivf_knn_duel", knn)
      println(s"PROBE t=$t ivf_knn_duel pair_cost=${pairCost(knn, "component")}")
      cent.unpersist(); knn.unpersist()
      truth.unpersist()
    }
    spark.stop()
  }
}
