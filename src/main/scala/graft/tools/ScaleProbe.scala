package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Scale-behavior probe: replicates the sf0.1 documents table K× with
  * shifted ids (every doc gains K-1 exact clones → a dense near-dup
  * workload) and times the heavy pipelines. Not a driver gate — evidence
  * that the plans scale linearly and the dedup candidate generation
  * stays bounded under heavy duplication.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scale-probe", 32)
    val k = if (args.nonEmpty) args(0).toInt else 10
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text")))
      .reduce(_ unionByName _)
      .repartition(64).persist()
    println(s"PROBE docs=${big.count()}")
    // release() drops EVERY cached frame (operator-local persists);
    // re-cache just the probe's input so the next op isn't charged for
    // re-reading it
    def time(keep: org.apache.spark.sql.DataFrame)(name: String)
            (f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      graft.Housekeeping.release(spark)
      keep.persist().count()
    }
    time(big)("q6_tfidf")(TfIdfOps.tfIdfPipeline(big).count())
    time(big)("dedup_minhash")(Dedup.minHashLsh(big).count())
    time(big)("dedup_assign")(Dedup.assignCanonical(big).count())
    time(big)("text_stats")(TextStats.stats(big).count())

    // The embedding paths (round-2 plan changes): replicate the sf0.1
    // embeddings K× with shifted ids — every vector gains K-1 exact
    // clones, a dense near-dup workload for the banded SRP-LSH plan
    // (pair OUTPUT grows ~K²/2 per base vector; the probe shows the
    // candidate join stays keyed, no BNLJ blowup), and a K×-both-sides
    // load for the sign-bucket top-k (output is linear: k rows per
    // query).
    val embBase = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
    val embBig = (0 until k).map(i =>
        embBase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _)
      .repartition(64).persist()
    println(s"PROBE vectors=${embBig.count()}")
    time(embBig)("dedup_embedding")(Dedup.embeddingNearDup(embBig).count())
    time(embBig)("sim_topk_lsh")(Similarity.lshTopK(
      embBig.filter(col("vec_id") % 50 === 0), embBig).count())
    spark.stop()
  }
}
