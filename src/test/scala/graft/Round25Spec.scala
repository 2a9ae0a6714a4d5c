package graft

import org.apache.spark.sql.functions._

import graft.operators.Search

/** Round-12 pins, batch 1: the persisted two-tower hybrid retrieval
  * artifact (VERDICT r11 task 4 — serve RRF fusion from the stored
  * BM25 postings + stored dense vectors, never re-touching the corpus
  * text at query time).
  */
class Round25Spec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark shuffle exchange partitions data across executors"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark broadcast joins avoid the shuffle for small tables"),
    (3L, "a lazy dog sleeps while the fox runs through the forest"),
    (4L, "columnar parquet scans prune row groups by min max stats"),
    (5L, "executors spill to disk when the shuffle partition is large"),
    (6L, "dogs and foxes are mammals; parquet files are not"),
    (7L, "broadcast the dimension table and let catalyst pick the join"))
    .toDF("doc_id", "text")

  test("hybridRrfFromIndex: served fusion is bit-identical to the " +
    "in-plan hybridRrf — same docs, ranks, and 6-dp rrf scores") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spec_hybrid").toString
    val terms = Seq("shuffle", "fox")
    Search.hybridIndexWrite(corpus, dir)
    val served = Search.hybridRrfFromIndex(spark, dir, terms, k = 6)
    val inPlan = Search.hybridRrf(corpus, terms, k = 6)
    assert(rows(served) === rows(inPlan))
    assert(served.collect().nonEmpty)
  }

  test("hybridRrfFromIndex: query cost never re-reads the corpus — " +
    "the plan's parquet scans are only the artifact directories") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spec_hybrid2").toString
    val data = java.nio.file.Files
      .createTempDirectory("graft_spec_hybrid2_data").toString
    corpus.write.mode("overwrite").parquet(data)
    Search.hybridIndexWrite(spark.read.parquet(data), dir)
    val plan = Search.hybridRrfFromIndex(spark, dir, Seq("fox"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains(data),
      s"served plan re-scans the corpus dir:\n$plan")
  }

  test("hybridIndexWrite: the dense tower stores the per-doc-pure " +
    "hash-embedding space (stored rows == in-plan hashEmbedBuckets)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spec_hybrid3").toString
    Search.hybridIndexWrite(corpus, dir)
    val stored = spark.read.parquet(s"$dir/dense")
    assert(rows(stored.orderBy("doc_id", "j")) ===
      rows(graft.operators.TextStats.hashEmbedBuckets(corpus)
        .orderBy("doc_id", "j")))
  }
}
