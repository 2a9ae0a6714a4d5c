package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Throwaway: lm_score + decontam-bloom scale check at K× sf0.1. */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("lm-probe", 32)
    val k = if (args.nonEmpty) args(0).toInt else 30
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text"), col("source"), col("lang")))
      .reduce(_ unionByName _)
      .repartition(64).persist()
    println(s"PROBE docs=${big.count()}")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      graft.Housekeeping.release(spark)
    }
    time("lm_score_window")(TextStats.lmScore(big).count())
    time("lm_score_scalable")(TextStats.lmScoreScalable(big).count())
    time("text_chunk")(TextStats.chunk(big).count())
    val corpus = big.filter(col("doc_id") % 20 =!= 0)
    val bench = big.filter(col("doc_id") % 20 === 0)
    time("decontam_exact")(Dedup.decontaminate(corpus, bench, n = 4).count())
    time("decontam_bloom")(
      Dedup.decontaminateBloom(corpus, bench, n = 4).count())
    time("corpus_shingles")(Dedup.shingles(corpus, 4).count())
    // the bloom's regime: a benchmark-shingle side too large to
    // broadcast (at 100 TB the bench set is many engines' worth of
    // eval suites). Simulate by disabling broadcast: exact degrades to
    // a full shuffle of every corpus shingle; bloom filters them at the
    // scan and shuffles survivors only.
    val noBc = spark.newSession()
    noBc.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bigN = noBc.createDataFrame(big.rdd, big.schema)
    val corpusN = bigN.filter(col("doc_id") % 20 =!= 0)
    val benchN = bigN.filter(col("doc_id") % 20 === 0)
    time("decontam_exact_nobroadcast")(
      Dedup.decontaminate(corpusN, benchN, n = 4).count())
    time("decontam_bloom_nobroadcast")(
      Dedup.decontaminateBloom(corpusN, benchN, n = 4).count())
    spark.stop()
  }
}
