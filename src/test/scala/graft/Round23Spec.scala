package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-11 pins, batch 1: semantic dedup composed onto the
  * IVF-routed kNN components (the round-10 verdict #1 composition).
  */
class Round23Spec extends SparkSpec {

  import spark.implicits._

  // --- Dedup.semanticDedupKnn ---

  test("semanticDedupKnn: within a reciprocal-kNN component the duel " +
    "keeps the best-quality member and drops verified near-dups only") {
    // two tight direction groups + isolated vectors. k=2 mutual graph:
    // {1,3,5} are each other's top neighbors (cos ~1), {2,4} likewise;
    // 20/21 point apart (cos to everything else ≤ 0). Components form
    // on mutual edges; the duel then verifies cosine >= threshold.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (3L, Array(0.999f, 0.001f, 0.0f)),
      (5L, Array(0.998f, 0.002f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.0f, 0.9f, 0.0f)),
      (20L, Array(-1.0f, 0.0f, 0.0f)), (21L, Array(0.0f, -1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val quality = Seq((1L, 10L), (3L, 99L), (5L, 50L),
      (2L, 7L), (4L, 7L), (20L, 1L), (21L, 1L))
      .toDF("vec_id", "q")
    val out = Dedup.semanticDedupKnn(emb, quality, threshold = 0.9,
        nCentroids = 4, nProbe = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Boolean]("keep")).toMap
    // id 3 wins its component on quality despite not being lowest id
    assert(out(3L) && !out(1L) && !out(5L))
    // equal quality → lowest id keeps (the family tie rule)
    assert(out(2L) && !out(4L))
    // members of the same component BELOW the cosine threshold are
    // kept: the duel verifies, the component only blocks — vectors
    // with no mutual edge (singletons) never appear in the output
    assert(!out.contains(20L) || out(20L))
  }

  test("semanticDedupKnn: quality column is bound by NAME, missing " +
    "quality rows rank worst, and negative ids raise") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (3L, Array(0.999f, 0.001f)),
      (7L, Array(0.0f, 1.0f)), (8L, Array(0.1f, 0.995f)))
      .toDF("vec_id", "embedding")
    // extra + reordered columns: label first would be the positional
    // trap — the named binding must pick q
    val quality = Seq((1L, 500L, 1.0), (3L, 500L, 9.0))
      .toDF("vec_id", "label", "q")
    val out = Dedup.semanticDedupKnn(emb, quality, threshold = 0.9,
        nCentroids = 2, nProbe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Boolean]("keep")).toMap
    assert(out(3L) && !out(1L)) // q=9 beats q=1, not label 500 vs 500
    // 7/8 have NO quality row: both rank q=0, tie → lowest id keeps
    assert(out(7L) && !out(8L))
    // mis-named quality column fails fast
    val bad = intercept[IllegalArgumentException] {
      Dedup.semanticDedupKnn(emb,
        Seq((1L, 1.0)).toDF("vec_id", "score"))
    }
    assert(bad.getMessage.contains("score") ||
      bad.getMessage.contains("no column"))
    // a negative id that reaches the duel raises in-plan (the -id
    // argmax tie contract), never yields silently wrong exemplars
    val neg = Seq((-1L, Array(1.0f, 0.0f)), (2L, Array(0.999f, 0.001f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Dedup.semanticDedupKnn(neg, Seq((2L, 1.0)).toDF("vec_id", "q"),
        threshold = 0.9, nCentroids = 2, nProbe = 2).collect()
    }
    assert(ex.getMessage.contains("non-negative") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-negative")))
  }

  // --- Sampling.mixtureFitFloors ---

  test("mixtureFitFloors: floors honored, scarce sources cap, the " +
    "rest water-fill by weight, and the allocations exhaust the budget") {
    import graft.operators.Sampling
    // budget = 0.5 × 10000 = 5000. floors: d is guaranteed 1500 (more
    // than its fair share); c is scarce (avail 200, weight 5 → caps);
    // a/b split the remainder by weight 2:1.
    val stats = Seq(
      ("a", 4000.0, 2.0, 0.0), ("b", 3800.0, 1.0, 0.0),
      ("c", 200.0, 5.0, 0.0), ("d", 2000.0, 1.0, 1500.0))
      .toDF("source", "avail", "w", "floor_tokens")
    val out = Sampling.mixtureFitFloors(stats).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val alloc = out.view.mapValues(_.getAs[Double]("alloc_tokens")).toMap
    // Σ alloc = budget (round2 noise only)
    assert(math.abs(alloc.values.sum - 5000.0) < 0.05)
    // c capped at its avail, d floor-bound at its floor
    assert(out("c").getAs[Boolean]("capped") && alloc("c") == 200.0)
    assert(out("d").getAs[Boolean]("floored") && alloc("d") == 1500.0)
    // a and b are active: same water level alloc/w, 2:1 by weight
    assert(!out("a").getAs[Boolean]("capped") &&
      !out("a").getAs[Boolean]("floored"))
    assert(math.abs(alloc("a") / 2.0 - alloc("b")) < 0.05)
    // floors above avail clamp to avail
    val clamped = Sampling.mixtureFitFloors(
      Seq(("x", 100.0, 1.0, 999.0), ("y", 10000.0, 1.0, 0.0))
        .toDF("source", "avail", "w", "floor_tokens"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("floor_tokens")).toMap
    assert(clamped("x") == 100.0)
    // infeasible floors (Σ floors > budget) raise in-plan, loudly
    val ex = intercept[Exception] {
      Sampling.mixtureFitFloors(
        Seq(("p", 1000.0, 1.0, 900.0), ("q", 1000.0, 1.0, 900.0))
          .toDF("source", "avail", "w", "floor_tokens")).collect()
    }
    assert(ex.getMessage.contains("infeasible") ||
      Option(ex.getCause).exists(_.getMessage.contains("infeasible")))
  }

  test("mixtureFitFloorsApply: zero floors reduce exactly to " +
    "mixtureFitApply; floors move per-source keep sets monotonically") {
    import graft.operators.Sampling
    val stats = Seq(
      ("a", 4000.0, 2.0, 0.0), ("b", 3800.0, 1.0, 0.0),
      ("c", 200.0, 5.0, 0.0), ("d", 2000.0, 1.0, 1500.0))
      .toDF("source", "avail", "w", "floor_tokens")
    val zeroF = stats.withColumn("floor_tokens", lit(0.0))
    val corpus = (1L to 800L).toDF("doc_id")
      .withColumn("source",
        element_at(array(lit("a"), lit("b"), lit("c"), lit("d")),
          (col("doc_id") % 4 + 1).cast("int")))
    // all stats values integral → both solves compute the same exact
    // λ* (1200) and identical thresholds: same kept rows
    assert(rows(Sampling.mixtureFitFloorsApply(corpus, zeroF)) ===
      rows(Sampling.mixtureFitApply(corpus, stats)))
    // with d floored at 1500 (λ* = 1100): same-salt hash keep sets are
    // NESTED in the threshold, so d's kept set grows to a superset
    // (rate 0.6 → 0.75) and a's shrinks to a subset (0.6 → 0.55)
    def kept(df: org.apache.spark.sql.DataFrame, src: String) =
      df.filter(col("source") === src).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val base = Sampling.mixtureFitApply(corpus, stats)
    val floored = Sampling.mixtureFitFloorsApply(corpus, stats)
    assert(kept(base, "d").subsetOf(kept(floored, "d")))
    assert(kept(floored, "d").size > kept(base, "d").size)
    assert(kept(floored, "a").subsetOf(kept(base, "a")))
  }

  // --- Similarity.ivfRangeSearch / Sampling.clusterStratifiedSample ---

  test("ivfRangeSearch: with all lists probed it equals the brute " +
    "threshold filter; zero vectors never match") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)),
      (5L, Array(0.7f, 0.7f)), (6L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 1L)
    val out = Similarity.ivfRangeSearch(q, emb, threshold = 0.5,
        nCentroids = 4, nProbe = 4)
      .collect().map(r => r.getAs[Long]("neighbor_id") ->
        r.getAs[Double]("cos")).toMap
    // cos(1,2)≈0.994, cos(1,5)≈0.707 pass; 3 (0.0), 4 (-1), 6 (zero
    // vector, no cosine) do not; the query never matches itself
    assert(out.keySet === Set(2L, 5L))
    assert(out(5L) === 0.71) // round2 of 1/sqrt(2)
  }

  test("clusterStratifiedSample: every cluster is capped at " +
    "perCluster and the draw is deterministic") {
    import graft.operators.Sampling
    val emb = (1L to 200L).toDF("vec_id")
      .withColumn("embedding", array(
        (col("vec_id") % 7).cast("float"), lit(1.0f),
        (col("vec_id") % 3).cast("float")))
    val s1 = Sampling.clusterStratifiedSample(emb, perCluster = 5,
      nClusters = 8)
    val perCid = s1.groupBy("cid").count().collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Long]("count")).toMap
    assert(perCid.nonEmpty && perCid.values.forall(_ <= 5))
    // dense clusters fill their quota exactly
    assert(perCid.values.exists(_ == 5))
    assert(rows(s1) === rows(Sampling.clusterStratifiedSample(emb,
      perCluster = 5, nClusters = 8)))
  }

  // --- TextStats.cardState / cardFromState (the streaming card) ---

  test("cardState: state from disjoint batches merges by addition to " +
    "the one-shot state, and cardFromState equals corpusCard minus " +
    "dup_rate") {
    import graft.operators.TextStats
    val docs = Seq(
      (1L, "web", "the of and in to a is it"),
      (2L, "web", "der die und in den von zu das"),
      (3L, "web", "the the the quick brown fox"),
      (4L, "books", "el la de que y en un ser"),
      (5L, "books", "le la de et les des en une"),
      (6L, "books", "le un bon livre de la table"))
      .toDF("doc_id", "source", "text")
    val parts = Seq(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    val merged = parts.map(TextStats.cardState(_))
      .reduce(_ unionByName _)
      .groupBy("source", "lang")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
    assert(rows(merged) === rows(TextStats.cardState(docs)))
    // the assembled card is the batch card minus its one
    // non-mergeable column
    assert(rows(TextStats.cardFromState(TextStats.cardState(docs))) ===
      rows(TextStats.corpusCard(docs).drop("dup_rate")))
  }
}
