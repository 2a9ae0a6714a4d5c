package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, TextStats}

/** Round-9 pins, batch 2: duplicated-chunk REMOVAL with document
  * reconstruction (first-occurrence-wins, in-order reassembly), bigram
  * PMI collocations (hand-computed values, minCount cutoff, pinned
  * rank order), and per-language tokenizer fertility from the stored
  * BPE artifact.
  */
class Round19Spec extends SparkSpec {

  import spark.implicits._

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_spec_$tag").toString

  // --- Dedup.chunkDedupRewrite ---

  test("chunkDedupRewrite: exact clone loses every chunk, original " +
    "survives untouched") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f")).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRewrite(docs, w = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_clean") === "a b c d e f")
    assert(out(0).getAs[Long]("n_dropped") === 0L)
    assert(out(1).getAs[String]("text_clean") === "")
    assert(out(1).getAs[Long]("n_chunks") === 2L)
    assert(out(1).getAs[Long]("n_dropped") === 2L)
  }

  test("chunkDedupRewrite: within-document repeat keeps only the " +
    "first occurrence, order preserved") {
    val docs = Seq((1L, "x y z x y z a b c")).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRewrite(docs, w = 3).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("text_clean") === "x y z a b c")
    assert(out(0).getAs[Long]("n_dropped") === 1L)
  }

  test("chunkDedupRewrite: partial cross-doc overlap cuts only the " +
    "shared chunk from the larger doc_id") {
    val docs = Seq(
      (2L, "p q r s t u"), // shares its FIRST chunk with doc 1
      (1L, "p q r z z z")).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRewrite(docs, w = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text_clean") === "p q r z z z")
    assert(out(1).getAs[String]("text_clean") === "s t u")
    assert(out(1).getAs[Long]("n_dropped") === 1L)
  }

  test("chunkDedupRewrite: shorter-than-w doc is one whole-text chunk") {
    val docs = Seq((1L, "only two")).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRewrite(docs, w = 8).collect()
    assert(out(0).getAs[Long]("n_chunks") === 1L)
    assert(out(0).getAs[String]("text_clean") === "only two")
  }

  // --- TextStats.pmiCollocations ---

  test("pmiCollocations: hand-computed PMI, ties pinned by (a, b)") {
    // bigrams: (a,b)x3? no — "a b a b": (a,b),(b,a),(a,b) = 3; "c d" = 1
    // N=6 unigrams (a:2 b:2 c:1 d:1), B=4 bigram occurrences
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextStats.pmiCollocations(docs, minCount = 1L, k = 10)
      .collect()
    val got = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getDouble(3)))
    // PMI(c,d)=log10(1*36/(4*1*1))=0.95; PMI(a,b)=log10(2*36/(4*4))=0.65
    // PMI(b,a)=log10(1*36/(4*4))=0.35 — rank order (pmi desc, a, b)
    assert(got === Array(
      ("c", "d", 1L, 0.95),
      ("a", "b", 2L, 0.65),
      ("b", "a", 1L, 0.35)))
  }

  test("pmiCollocations: minCount drops rare bigrams") {
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextStats.pmiCollocations(docs, minCount = 2L, k = 10)
      .collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a"))
  }

  // --- Graph.labelPropagate (LPA communities) ---

  private def symEdges(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("labelPropagate: one round adopts the mode neighbor label, " +
    "ties break to the smallest, isolated keeps seed") {
    // triangle 1-2-3, pendant 4 on 3, isolated 5
    val edges = symEdges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val labels0 = Seq(1L, 2L, 3L, 4L, 5L).map(n => (n, n))
      .toDF("node", "lbl")
    val r1 = Graph.labelPropagate(labels0, edges, iters = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    // node1 nbr labels {2,3} tie -> 2; node2 {1,3} -> 1;
    // node3 {1,2,4} -> 1; node4 {3} -> 3; node5 isolated -> 5
    assert(r1 === Array((1L, 2L), (2L, 1L), (3L, 1L), (4L, 3L), (5L, 5L)))
  }

  test("labelPropagate: two rounds converge the triangle+pendant to " +
    "one community") {
    val edges = symEdges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val labels0 = Seq(1L, 2L, 3L, 4L, 5L).map(n => (n, n))
      .toDF("node", "lbl")
    val r2 = Graph.labelPropagate(labels0, edges, iters = 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r2 === Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L)))
  }

  test("labelPropagate: mode beats smaller minority label") {
    // star: node 10 has three neighbors labeled 7 and one labeled 1 —
    // mode 7 wins although 1 is smaller
    val edges = symEdges((10L, 2L), (10L, 3L), (10L, 4L), (10L, 1L))
    val labels0 = Seq((10L, 10L), (1L, 1L), (2L, 7L), (3L, 7L), (4L, 7L))
      .toDF("node", "lbl")
    val r1 = Graph.labelPropagate(labels0, edges, iters = 1)
      .filter(col("node") === 10L).collect()
    assert(r1(0).getLong(1) === 7L)
  }

  // --- TextStats.bpeFertility ---

  test("bpeFertility: per-language tokens-per-word and chars-per-token " +
    "from the stored artifact") {
    // rounds=1 trains the single merge (a,b): abc -> "ab c" (2 syms),
    // ab -> "ab" (1 sym)
    val docs = Seq(
      (1L, "abc abc", "en"),
      (2L, "ab", "fr")).toDF("doc_id", "text", "lang")
    val dir = scratch("bpefert")
    TextStats.bpeArtifactWrite(docs, dir, rounds = 1)
    val out = TextStats.bpeFertility(docs, dir)
      .orderBy("lang").collect()
    val en = out(0)
    assert(en.getAs[String]("lang") === "en")
    assert(en.getAs[Long]("n_words") === 2L)
    assert(en.getAs[Long]("n_bpe_tokens") === 4L)
    assert(en.getAs[Long]("n_chars") === 6L)
    assert(en.getAs[Double]("fertility") === 2.0)
    assert(en.getAs[Double]("chars_per_token") === 1.5)
    val fr = out(1)
    assert(fr.getAs[Long]("n_bpe_tokens") === 1L)
    assert(fr.getAs[Double]("fertility") === 1.0)
    assert(fr.getAs[Double]("chars_per_token") === 2.0)
  }
}
