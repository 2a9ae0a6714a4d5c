package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Dedup, Graph, TextStats}

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

  // --- Graph.modularity ---

  test("modularity: triangle + disjoint pair partition scores the " +
    "hand-computed Q = 0.375") {
    // E=8 directed; A={1,2,3}: in=6, d=6; B={4,5}: in=2, d=2
    // num = (6*8-36) + (2*8-4) = 24; Q = 24/64 = 0.375
    val edges = symEdges((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("node", "lbl")
    val out = Graph.modularity(labels, edges).collect()(0)
    assert(out.getAs[Long]("n_communities") === 2L)
    assert(out.getAs[Long]("m_directed") === 8L)
    assert(out.getAs[Double]("q_modularity") === 0.375)
  }

  test("modularity: the all-one-community partition scores exactly 0") {
    val edges = symEdges((1L, 2L), (2L, 3L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "lbl")
    val out = Graph.modularity(labels, edges).collect()(0)
    assert(out.getAs[Double]("q_modularity") === 0.0)
  }

  // --- Classify.nbEval ---

  test("nbEval: separable two-class corpus scores perfect per-class " +
    "precision/recall/F1 with exact supports") {
    val docs = Seq(
      (1L, "aa aa aa", "x"), (2L, "aa aa", "x"),
      (3L, "bb bb bb", "y")).toDF("doc_id", "text", "lang")
    val out = Classify.nbEval(docs).orderBy("lang").collect()
    val x = out(0)
    assert(x.getAs[String]("lang") === "x")
    assert(x.getAs[Long]("n_true") === 2L)
    assert(x.getAs[Long]("n_pred") === 2L)
    assert(x.getAs[Long]("tp") === 2L)
    assert(x.getAs[Double]("precision") === 1.0)
    assert(x.getAs[Double]("recall") === 1.0)
    assert(x.getAs[Double]("f1") === 1.0)
    val y = out(1)
    assert(y.getAs[Long]("n_true") === 1L)
    assert(y.getAs[Double]("f1") === 1.0)
  }

  test("nbEval: a never-predicted class reports NULL precision, " +
    "zero recall, and the integer-identity F1") {
    // doc 3's tokens are all 'aa' — it classifies as x, so class y has
    // n_true=1, n_pred=0, tp=0
    val docs = Seq(
      (1L, "aa aa aa", "x"), (2L, "aa aa", "x"),
      (3L, "aa", "y")).toDF("doc_id", "text", "lang")
    val out = Classify.nbEval(docs).orderBy("lang").collect()
    val y = out(1)
    assert(y.getAs[String]("lang") === "y")
    assert(y.getAs[Long]("n_pred") === 0L)
    assert(y.isNullAt(y.fieldIndex("precision")))
    assert(y.getAs[Double]("recall") === 0.0)
    assert(y.getAs[Double]("f1") === 0.0)
    val x = out(0)
    assert(x.getAs[Long]("n_pred") === 3L)
    // precision 2/3 -> 0.67, recall 1, f1 = 4/5 = 0.8
    assert(x.getAs[Double]("precision") === 0.67)
    assert(x.getAs[Double]("f1") === 0.8)
  }

  // --- CompatIo.overwritePartitionsDynamic ---

  test("overwritePartitionsDynamic: restated partition replaced, " +
    "untouched partitions keep their rows, conf restored") {
    val dir = scratch("dynow")
    val v1 = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("part", "v")
    graft.io.CompatIo.writePartitioned(v1, dir, "part")
    val prev = spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
    val restated = Seq(("b", 99L)).toDF("part", "v")
    graft.io.CompatIo.overwritePartitionsDynamic(restated, dir, "part")
    assert(spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode") === prev)
    val back = spark.read.parquet(dir)
      .select(col("part").cast("string").as("part"), col("v"))
      .orderBy("part", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(back === Array(("a", 1L), ("a", 2L), ("b", 99L)))
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

  // --- TextStats.langIdMix ---

  test("langIdMix: an en/es half-and-half doc reports two languages " +
    "with the en-precedence tie pin") {
    // 128 tokens -> two 64-token tiles: all-'the' (en-only marker) then
    // all-'que' (es-only marker); 1-1 chunk tie -> main_lang en
    val text = (Seq.fill(64)("the") ++ Seq.fill(64)("que")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextStats.langIdMix(docs).collect()(0)
    assert(out.getAs[Long]("n_chunks") === 2L)
    assert(out.getAs[Long]("n_langs") === 2L)
    assert(out.getAs[String]("main_lang") === "en")
    assert(out.getAs[Double]("main_frac") === 0.5)
    assert(out.getAs[Boolean]("code_switched"))
  }

  test("langIdMix: a monolingual short doc is one chunk, one language, " +
    "full share") {
    val docs = Seq(
      (1L, Seq.fill(10)("und").mkString(" ")),
      (2L, "")).toDF("doc_id", "text")
    val out = TextStats.langIdMix(docs).collect()
    assert(out.length === 1) // zero-token doc emits nothing
    assert(out(0).getAs[Long]("n_chunks") === 1L)
    assert(out(0).getAs[String]("main_lang") === "de")
    assert(out(0).getAs[Double]("main_frac") === 1.0)
    assert(!out(0).getAs[Boolean]("code_switched"))
  }

  // --- Search.hybridRrf ---

  test("hybridRrf: fused score replays the two-term reciprocal " +
    "identity from the emitted ranks, strongest lexical doc is " +
    "bm_rank 1") {
    val docs = Seq(
      (1L, "join scan window"),
      (2L, "join join join zzz"),
      (3L, "qqq www eee")).toDF("doc_id", "text")
    val out = graft.operators.Search
      .hybridRrf(docs, Seq("join"), k = 5, r = 5).collect()
    assert(out.nonEmpty && out.length <= 5)
    out.foreach { row =>
      def t(i: Int) =
        if (row.isNullAt(i)) 0.0 else 1.0 / (60 + row.getLong(i))
      val expect = math.floor((t(1) + t(2)) * 1000000 + 0.5) / 1000000
      assert(row.getAs[Double]("rrf_score") === expect)
    }
    val scores = out.map(_.getAs[Double]("rrf_score"))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
    val d2 = out.find(_.getLong(0) === 2L).get
    assert(d2.getLong(1) === 1L) // bm25: tf 3 in dl 4 beats tf 1 in dl 3
  }
}
