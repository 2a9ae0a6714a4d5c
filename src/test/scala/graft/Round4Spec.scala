package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-4 behavior pins: the SQL-expressible multimodal stub decoder
  * (mapPartitions path ≡ in-plan expression twin), ANN recall floors vs
  * the exact ranking, the boundary-bucket domain cap's equivalence to
  * the window form, and the scale-hardened LM scorer. */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  // ---- multimodal: production path ≡ in-plan expression twin ----

  test("mm: featuresInPlan == extractFeatures (flattened), incl. edge payloads") {
    // lengths straddling the stripe width (8): empty, 1, 7, 8, 9, long,
    // multi-byte UTF-8 (stripe hashing is over BYTES, not chars)
    val docs = Seq(
      (0L, ""), (1L, "a"), (2L, "abcdefg"), (3L, "abcdefgh"),
      (4L, "abcdefghi"), (5L, "the quick brown fox jumps over it all"),
      (6L, "Ωδß — ünïcødé 𐍈"),
    ).toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.withPayload(docs)
    val dims = 0 until graft.multimodal.Multimodal.FeatureDims
    val prod = graft.multimodal.Multimodal.extractFeatures(media).toDF()
      .select((Seq("doc_id", "width", "height", "n_bytes").map(col) ++
        dims.map(i =>
          get(col("features"), lit(i)).cast("double").as(s"f$i"))): _*)
    val inPlan = graft.multimodal.Multimodal.featuresInPlan(media)
    assert(rows(prod) == rows(inPlan))
    assert(rows(prod).size == 7)
  }

  test("mm: stub decoder accumulator stays bounded (mod each step)") {
    val bytes = Array.fill(10000)(0xff.toByte)
    val f = graft.multimodal.Multimodal.fakeDecodeFeatures(bytes)
    assert(f.length == 8 && f.forall(v => v >= 0.0f && v < 1.0f))
  }

  // ---- ANN recall floors vs the exact ranking ----

  // Floors measured by tools/RecallProbe on the sf0.1 fixture (lsh
  // 0.105, ivf 0.500). The synthetic embeddings are near-uniform —
  // the hardest regime for space-partitioning ANN (no cluster structure
  // to exploit; lshTopK probes ~9/256 buckets ≈ 3.5% of the space), so
  // the floors are honest fixture properties, not quality targets.
  // What the spec guards: a tuning change (nBits, bands, nProbe,
  // codebook) silently gutting recall while the fixed-plan oracle
  // stays green — e.g. a broken band join scores ~0.
  test("ANN recall@10 vs bruteTopK holds the measured floor (sf0.1)") {
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.bruteTopK(q, e)
      .select("query_id", "neighbor_id").persist()
    val nb = brute.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id")).count() / nb
    val lsh = recall(Similarity.lshTopK(q, e))
    val ivf = recall(Similarity.ivfTopK(q, e))
    // trained codebook must BEAT the lowest-id default (measured 0.5525
    // vs 0.5000 at sf0.1) — the whole point of training
    val trained = recall(Similarity.ivfTopK(q, e,
      codebook = Some(Similarity.trainCodebook(e))))
    brute.unpersist()
    assert(lsh >= 0.08, s"lshTopK recall@10 degraded: $lsh < 0.08")
    assert(ivf >= 0.45, s"ivfTopK recall@10 degraded: $ivf < 0.45")
    assert(trained >= 0.50,
      s"trained-codebook ivfTopK recall@10 degraded: $trained < 0.50")
  }

  test("trainCodebook is run-to-run deterministic (decimal-summed means)") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val a = Similarity.trainCodebook(e).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Similarity.trainCodebook(e).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    assert(a.size == 16)
  }

  // ---- scalable domain cap ≡ window domain cap ----

  test("capPerStratumScalable == capPerStratum on sf0.1 documents") {
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    for (cap <- Seq(1, 10, 377, 100000)) {
      val w = Sampling.capPerStratum(docs, cap).select("doc_id", "source")
      val s = Sampling.capPerStratumScalable(docs, cap)
        .select("doc_id", "source")
      assert(rows(w) == rows(s), s"cap=$cap")
    }
  }

  test("capPerStratumScalable: NULL stratum kept as its own group, NULL keys drop") {
    val df = Seq[(java.lang.Long, String)](
      (1L, null), (2L, null), (3L, null), (4L, "a"), (5L, "a"),
      (null, "a"), (null, null),
    ).toDF("doc_id", "source")
    val w = Sampling.capPerStratum(df, 2).select("doc_id", "source")
    val s = Sampling.capPerStratumScalable(df, 2)
      .select("doc_id", "source")
    assert(rows(w) == rows(s))
    assert(s.count() == 4) // 2 of the NULL stratum + both 'a' rows
  }

  // ---- scale-hardened LM scorer ----

  test("lmScoreScalable(minCount=0) == lmScore") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "a dog sat"),
      (4L, "single"),
    ).toDF("doc_id", "text")
    assert(rows(TextStats.lmScoreScalable(docs)) ==
      rows(TextStats.lmScore(docs)))
  }

  // ---- bloom-prefiltered decontamination ----

  test("decontaminateBloom == decontaminate (sf0.01, gate split)") {
    val d = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val corpus = d.filter(col("doc_id") % 20 =!= 0)
    val bench = d.filter(col("doc_id") % 20 === 0)
    assert(rows(Dedup.decontaminateBloom(corpus, bench, n = 4)) ==
      rows(Dedup.decontaminate(corpus, bench, n = 4)))
  }

  test("decontaminateBloom exact under heavy false positives (m=64)") {
    // 64-bit filter + 5 hashes per shingle saturates the bitmap — nearly
    // every corpus shingle passes the prefilter, the exact join still
    // discards all of them
    val corpus = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh")).toDF("doc_id", "text")
    val bench = Seq((100L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val got = Dedup.decontaminateBloom(corpus, bench, n = 2, log2Bits = 6)
    assert(rows(got) == rows(Dedup.decontaminate(corpus, bench, n = 2)))
    assert(got.count() == 1) // only doc 1 shares 2-grams
  }

  test("decontaminateBloom: empty benchmark flags nothing") {
    val corpus = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val bench = corpus.filter(lit(false))
    assert(Dedup.decontaminateBloom(corpus, bench).count() == 0)
  }

  // ---- token-window chunking ----

  test("chunk: coverage, overlap, and tail semantics") {
    val docs = Seq(
      (1L, ""),                       // 0 tokens -> no chunks
      (2L, "   "),                    // whitespace-only -> no chunks
      (3L, "a b c"),                  // < chunk -> 1 short chunk
      (4L, (1 to 4).map("t" + _).mkString(" ")),  // == chunk -> exactly 1
      (5L, (1 to 5).map("t" + _).mkString(" ")),  // chunk+1 -> 2, overlap 1
      (6L, (1 to 11).map("t" + _).mkString(" ")), // stride 3: chunks at 0,3,6,9
    ).toDF("doc_id", "text")
    val out = TextStats.chunk(docs, chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(!out.keys.exists(_._1 <= 2L))
    assert(out((3L, 0L)) == (3L, "a b c"))
    assert(out((4L, 0L)) == (4L, "t1 t2 t3 t4"))
    assert(out.keys.count(_._1 == 4L) == 1) // no empty trailing chunk
    assert(out((5L, 0L)) == (4L, "t1 t2 t3 t4"))
    assert(out((5L, 1L)) == (2L, "t4 t5"))  // overlap token t4 shared
    assert(out.keys.count(_._1 == 6L) == 4)
    assert(out((6L, 3L)) == (2L, "t10 t11"))
  }

  test("chunk: every token of every doc is covered") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val chunked = TextStats.chunk(docs, chunkTokens = 64, overlap = 16)
    // token coverage: sum over chunks of (chunk tokens - overlap towards
    // the next chunk) telescopes back to n_tokens per doc; cheaper exact
    // check: distinct tokens survive the round trip
    val back = chunked.groupBy("doc_id")
      .agg(sum(col("n_chunk_tokens")).as("tok_with_overlap"),
        count(lit(1)).as("n_chunks"))
    val orig = TextStats.stats(docs).select(col("doc_id"), col("n_tokens"))
    val joined = back.join(orig, "doc_id")
      .select(col("doc_id"),
        (col("tok_with_overlap") - lit(16) * (col("n_chunks") - 1) ===
          col("n_tokens")).as("ok"))
    assert(joined.filter(!col("ok")).count() == 0)
    assert(orig.filter(col("n_tokens") > 0).count() == back.count())
  }

  // ---- weighted (per-row probability) sampling ----

  test("weightedSample: clamp, determinism, and monotonicity in scale") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    assert(Sampling.weightedSample(docs, lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(docs, lit(1.0)).count() == docs.count())
    assert(Sampling.weightedSample(docs, lit(5.0)).count() == docs.count())
    assert(Sampling.weightedSample(docs, lit(null).cast("double")).count() == 0)
    // same salt ⇒ raising every row's probability only ADDS rows
    val lo = Sampling.weightedSample(docs, col("n_chars") / 6000.0)
      .select("doc_id")
    val hi = Sampling.weightedSample(docs, col("n_chars") / 3000.0)
      .select("doc_id")
    assert(lo.except(hi).count() == 0)
    assert(lo.count() < hi.count())
    // longer docs are kept proportionally more often
    val kept = Sampling.weightedSample(docs, col("n_chars") / 3000.0)
    assert(kept.agg(avg("n_chars")).head().getDouble(0) >
      docs.agg(avg("n_chars")).head().getDouble(0))
  }

  // ---- approx-quantile rank contract ----

  test("approxQuantiles: contract holds on lineitem at sf0.01 and sf0.001") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val li = Tables.load(spark, s"/root/testdata/$sf", "lineitem")
      val out = Relational.approxQuantiles(li).collect()
      assert(out.length == 4 && out.forall(_.getBoolean(1)), sf)
    }
  }

  test("approxQuantiles: duplicate-heavy column stays within contract") {
    // 90% of the mass is one value — the rank INTERVAL check must accept
    // the estimate even though frac(<= e) jumps far past p
    val df = spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, lit(42.0))
        .otherwise(col("id").cast("double")).as("l_extendedprice"))
    val out = Relational.approxQuantiles(df).collect()
    assert(out.length == 4 && out.forall(_.getBoolean(1)))
  }

  // ---- flatMapGroupsWithState ----

  test("typeCountsStateful == batch per-(user,type) counts (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.EventsStream
      .typeCountsStateful(spark, dir)
      .select("user_id", "event_type", "n_events")
    val batch = Tables.load(spark, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"))
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0)
  }

  test("lmScoreScalable minCount drops rare contexts from the model") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), // "the" context count >= 2
      (2L, "zzz qqq"),                // hapax context -> dropped
    ).toDF("doc_id", "text")
    val scored = TextStats.lmScoreScalable(docs, minCount = 2L)
    val byDoc = scored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 2's only bigram context (zzz, count 1) is below the cutoff:
    // the doc has no modeled bigram and drops entirely
    assert(!byDoc.contains(2L))
    // doc 1 keeps only bigrams whose w1-context count >= 2 ("the x": 2)
    assert(byDoc(1L) == 2L)
  }
}
