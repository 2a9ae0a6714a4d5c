package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Similarity}

/** Round-10 pins, batch 2: the mergeable bottom-k sample sketch (and
  * its streaming maintainer's identity with the one-shot batch
  * sample), and the IVF-routed density clusters.
  */
class Round22Spec extends SparkSpec {

  import spark.implicits._

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_spec_$tag").toString

  // --- Sampling.bottomK mergeability ---

  test("bottomK: merging per-part sketches equals the one-shot sketch " +
    "over the union (the identity the streaming maintainer rides)") {
    val all = (1L to 500L).toDF("doc_id")
    val parts = Seq(
      all.filter(col("doc_id") % 3 === 0),
      all.filter(col("doc_id") % 3 === 1),
      all.filter(col("doc_id") % 3 === 2))
    val merged = Sampling.bottomK(
      parts.map(p => Sampling.bottomK(p, 40))
        .reduce(_ unionByName _).select("doc_id"), 40)
    assert(rows(merged) === rows(Sampling.bottomK(all, 40)))
    // and the public sample is the sketch minus the hash column
    assert(rows(Sampling.fixedSizeSample(all, 40)) ===
      rows(Sampling.bottomK(all, 40).select("doc_id")))
  }

  test("sampleMaintain: the 3-batch maintained artifact is " +
    "bit-identical to the one-shot corpus sample") {
    val dir = scratch("smcorpus")
    (1L to 300L).toDF("doc_id")
      .withColumn("text", concat(lit("doc "), col("doc_id")))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val art = graft.streaming.EventsStream.sampleMaintain(
      spark, dir, scratch("smstage"), scratch("smart"), k = 25)
    val oneShot = Sampling.bottomK(
      spark.read.parquet(s"$dir/documents.parquet"), 25)
    assert(rows(art.select("doc_id", "h")) ===
      rows(oneShot.select("doc_id", "h")))
    Housekeeping.release(spark)
  }

  // --- Similarity.knnComponentsIvf ---

  test("knnComponentsIvf: well-separated embedding groups land in " +
    "distinct min-labeled components") {
    // two tight clusters along different axes + one far-off singleton;
    // ids interleaved so the 2 lowest-id centroids land one per
    // cluster and 1-of-2 routing scans exactly the home cluster —
    // reciprocal-2NN edges cannot cross clusters
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.01f)),
      (3L, Array(0.99f, 0.0f, 0.0f, 0.02f)),
      (5L, Array(0.98f, 0.0f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.01f)),
      (4L, Array(0.0f, 0.99f, 0.01f, 0.0f)),
      (6L, Array(0.0f, 0.98f, 0.0f, 0.02f)),
      (20L, Array(0.0f, 0.0f, -1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnComponentsIvf(emb, k = 2, nCentroids = 2,
        nProbe = 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("component")).toMap
    assert(Seq(1L, 3L, 5L).forall(out(_) === 1L))
    assert(Seq(2L, 4L, 6L).forall(out(_) === 2L))
    // the singleton has no mutual edge — omitted by construction
    assert(!out.contains(20L))
    Housekeeping.release(spark)
  }
}
