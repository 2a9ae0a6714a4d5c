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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      graft.Housekeeping.release(spark)
      big.persist().count() // keep only the input cached
    }
    time("q6_tfidf")(TfIdfOps.tfIdfPipeline(big).count())
    time("dedup_minhash")(Dedup.minHashLsh(big).count())
    time("dedup_assign")(Dedup.assignCanonical(big).count())
    time("text_stats")(TextStats.stats(big).count())
    spark.stop()
  }
}
