package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-3 behavior pins: md5-based (engine-portable) simhash /
  * hash-embed bases, UTF-8 canonical-id ordering for non-ASCII string
  * ids, the asof payload-collision rename, and the embedding-dims
  * uniformity guard. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("SimHashAgg.wordBasis == first 16 hex chars of Spark's md5 as u64") {
    val words = Seq("hello", "alpha", "Ω-word", "", "𐍈𐍈𐍈", "tail")
    val fromSpark = words.toDF("w")
      .select(col("w"), md5(col("w")).as("h"))
      .collect()
      .map(r => r.getString(0) ->
        java.lang.Long.parseUnsignedLong(r.getString(1).take(16), 16))
      .toMap
    for (w <- words)
      assert(graft.functions.SimHashAgg.wordBasis(w) == fromSpark(w),
        s"basis mismatch for '$w'")
  }

  test("hashEmbedBuckets: bucket/sign derived from md5 hex (portable)") {
    val docs = Seq((1L, "alpha beta beta gamma")).toDF("doc_id", "text")
    val got = TextStats.hashEmbedBuckets(docs, dims = 64).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(w: String): Int =
      (java.lang.Long.parseLong(md5hex(w).substring(28, 32), 16) % 64).toInt
    def sgn(w: String): Long =
      if (java.lang.Long.parseLong(md5hex(w).substring(0, 1), 16) % 2 == 1)
        1L else -1L
    val expected = Seq("alpha" -> 1L, "beta" -> 2L, "gamma" -> 1L)
      .groupBy { case (w, _) => bucket(w) }
      .view.mapValues(_.map { case (w, c) => sgn(w) * c }.sum)
      .filter(_._2 != 0).toMap
    assert(got == expected)
  }

  test("canonical ids: driver union-find agrees with distributed min() " +
    "for supplementary-plane string ids") {
    // UTF-16 code-unit order: "�" (U+FFFD) > "𐀀" (U+10000
    // as a surrogate pair starting 0xD800); UTF-8 byte order (= Spark's
    // min()): U+FFFD (ef bf bd) < U+10000 (f0 90 80 80). A UTF-16-ordered
    // driver comparator would label the component differently from the
    // distributed path.
    val idHigh = "doc𐀀" // U+10000
    val idLow = "doc�"        // U+FFFD — UTF-8-smaller, UTF-16-larger
    val docs = Seq(
      (idHigh, "alpha beta gamma delta epsilon"),
      (idLow, "alpha beta gamma delta epsilon"),
      ("docZ", "completely unrelated content lives here"),
    ).toDF("doc_id", "text")
    val expectMin = docs.agg(min(when(col("doc_id") =!= "docZ",
      col("doc_id")))).collect().head.getString(0)
    assert(expectMin == idLow) // pin Spark's own ordering first
    for (maxEdges <- Seq(1000000L, 0L)) { // driver path, distributed path
      val got = Dedup.assignCanonical(docs, threshold = 0.5,
        driverCcMaxEdges = maxEdges).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got(idHigh) == idLow && got(idLow) == idLow &&
        got("docZ") == "docZ", s"maxEdges=$maxEdges: $got")
    }
  }

  test("asofJoin renames colliding right PAYLOAD columns too") {
    val left = Seq((1L, 10L, 2.0)).toDF("k", "ts", "v")
    val right = Seq((1L, 5L, 7.5, "x")).toDF("k2", "ts", "v", "tag")
    val out = Relational.asofJoin(left, right, "k", "k2", "ts", "ts")
    assert(out.columns.toSeq ==
      Seq("k", "ts", "v", "v_right", "tag", "ts_right"))
    val r = out.collect().head
    assert(r.getDouble(out.columns.indexOf("v")) == 2.0 &&
      r.getDouble(out.columns.indexOf("v_right")) == 7.5 &&
      r.getLong(out.columns.indexOf("ts_right")) == 5L)
  }

  test("embeddingNearDup raises on non-uniform embedding dims") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)), // shorter vector — must raise, not miss
      (2L, Array(0.0f, 1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Dedup.embeddingNearDup(emb, threshold = 0.5).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-uniform embedding dims")), e)
  }

  test("embeddingNearDup exact-collapse == all-pairs on clone-heavy input") {
    // 3 base vectors, each cloned 3× (9 rows); bases 0/1 are near-dups,
    // base 2 is orthogonal; plus a zero-vector clone pair that must stay
    // excluded (cosine undefined on the all-pairs path)
    val bases = Seq(
      Array(1.0f, 0.0f, 0.0f), Array(0.99f, 0.1f, 0.0f),
      Array(0.0f, 0.0f, 1.0f))
    val rows = (for {
      (v, b) <- bases.zipWithIndex
      c <- 0 until 3
    } yield (b * 10L + c, v)) ++
      Seq((90L, Array(0.0f, 0.0f, 0.0f)), (91L, Array(0.0f, 0.0f, 0.0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val lsh = Dedup.embeddingNearDup(emb, threshold = 0.9)
    val exact = Dedup.embeddingNearDup(emb, threshold = 0.9,
      allPairs = true)
    assert(rows.nonEmpty)
    assert(super.rows(lsh) == super.rows(exact))
    // 6 clone pairs per base ×3 + 9 cross pairs between bases 0 and 1
    assert(lsh.count() == 3 * 3 + 9)
  }

  test("top-k rankers reject non-integral id columns with a clear error") {
    val emb = Seq(("a", Array(1.0f)), ("b", Array(0.5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopK(emb, emb)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("hashSample: deterministic, salt-independent draws, ~p fraction") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Sampling.hashSample(docs, 0.25)
    val b = Sampling.hashSample(docs, 0.25)
    assert(rows(a) == rows(b)) // same (key, salt, p) → same rows, always
    val n = docs.count().toDouble
    val frac = a.count() / n
    assert(math.abs(frac - 0.25) < 0.15, s"fraction $frac far from p")
    // different salt → a different (near-independent) draw
    val c = Sampling.hashSample(docs, 0.25, salt = "other")
    assert(rows(a) != rows(c))
    // p is monotone: the p=0.25 sample is a subset of the p=0.5 one
    // (same salt ⇒ same hash; only the threshold moves)
    val half = rows(Sampling.hashSample(docs, 0.5))
    assert(rows(a).forall(half.contains))
  }

  test("splitByHash: exhaustive, disjoint, ~weights") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val split = Sampling.splitByHash(docs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.count() == docs.count()) // adds a column, drops nothing
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > byName("val") &&
      byName("train") > byName("test"))
  }

  test("stratifiedSample honors per-stratum fractions") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Sampling.stratifiedSample(docs,
      Map("en" -> 1.0, "zh" -> 0.0), defaultFraction = 0.0)
    val langs = got.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs == Set("en")) // de/es/fr via default 0, zh explicit 0
    assert(got.count() ==
      docs.filter(col("lang") === "en").count()) // fraction 1.0 = all
  }

  test("gopherFlags: each rule fires on its designed violation") {
    // mean word length 4.4, 4 stopword hits per repeat, 65 words total
    val long =
      (("the quick brown foxes jumped over it is that lazy sleeping " +
        "dogs today ") * 5).trim
    val docs = Seq(
      (1L, long),                                // passes everything
      (2L, "too short"),                         // r_words fails
      (3L, long + " " + ("x" * 2000)),           // r_mean_len fails (>10)
      (4L, long + " " + ("### " * 30).trim),     // r_symbols + maybe alpha
      (5L, long.replaceAll("the|and|of|to|in|is|you|that|it|for", "zz")),
    ).toDF("doc_id", "text")                     // 5: r_stops fails
    val got = TextStats.gopherFlags(docs).collect()
      .map(r => r.getLong(0) -> (
        r.getBoolean(r.fieldIndex("r_words")),
        r.getBoolean(r.fieldIndex("r_mean_len")),
        r.getBoolean(r.fieldIndex("r_symbols")),
        r.getBoolean(r.fieldIndex("r_stops")),
        r.getBoolean(r.fieldIndex("keep")))).toMap
    assert(got(1L) == ((true, true, true, true, true)))
    assert(!got(2L)._1 && !got(2L)._5)
    assert(!got(3L)._2 && !got(3L)._5)
    assert(!got(4L)._3 && !got(4L)._5)
    assert(!got(5L)._4 && !got(5L)._5)
  }

  test("redactPii replaces emails, urls, digit runs in fixed order") {
    val docs = Seq(
      (1L, "mail me at a.b+c@ex-site.org or https://x.io/p?q=1 id 1234567"),
      (2L, "no pii here, just 123 and a word"),
    ).toDF("doc_id", "text")
    val got = TextStats.redactPii(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) ==
      ("mail me at <EMAIL> or <URL> id <NUM>", 1L, 1L, 1L))
    assert(got(2L) == ("no pii here, just 123 and a word", 0L, 0L, 0L))
  }

  test("quantizeInt8: values bounded, dequantization error <= scale/2") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Similarity.quantizeInt8(emb)
    val joined = emb.join(q, "vec_id")
      .select(col("vec_id"), col("embedding"), col("scale"), col("qvec"))
      .collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val xs = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val qs = r.getSeq[Int](3)
      assert(qs.forall(v => v >= -127 && v <= 127))
      xs.zip(qs).foreach { case (x, v) =>
        assert(math.abs(x.toDouble - v * scale) <= scale / 2 + 1e-12)
      }
    }
  }

  test("repetition: hand-checked shares on a fixed doc") {
    val docs = Seq(
      (1L, "a a a b"),           // top1 = 3/4; trigrams: aaa,aab distinct
      (2L, "x y x y x y"),       // top1 = 3/6; xyx,yxy,xyx,yxy → 2/4 dup
    ).toDF("doc_id", "text")
    val got = TextStats.repetition(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((4L, 0.75, 0.0)))
    assert(got(2L) == ((6L, 0.5, 0.5)))
  }

  test("decontaminate flags exactly docs sharing an n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // shares the benchmark 3-gram
      (2L, "epsilon zeta eta theta"), // clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "x alpha beta gamma y")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, bench, n = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("curate: every surviving row passes all four gates") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Curate.curate(d)
    val survivors = out.collect()
    assert(survivors.nonEmpty) // non-vacuous on the test corpus
    assert(survivors.forall(_.getDouble(3) >= 0.5)) // quality floor
    assert(survivors.forall(_.getString(1) == "en")) // lang gate
    // dedup gate: every survivor is its own canonical id
    val canon = Dedup.assignCanonical(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(survivors.forall(r => canon(r.getLong(0)) == r.getLong(0)))
    // sample gate: survivors are exactly the kept hash draws
    val ids = survivors.map(_.getLong(0)).toSet
    val keptIds = Sampling.hashSample(d, 0.5).collect()
      .map(_.getLong(0)).toSet
    assert(ids.subsetOf(keptIds))
  }

  test("ivfTopK: high recall vs brute on the test embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter($"vec_id" % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteTopK(q, emb, k = 5))
    val ivf = pairs(Similarity.ivfTopK(q, emb, k = 5))
    // probing 4/16 lists: every IVF hit is brute-valid is NOT guaranteed
    // (ivf ranks within probed lists), but overlap must be substantial
    // and the operator deterministic
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
    assert(ivf == pairs(Similarity.ivfTopK(q, emb, k = 5))) // deterministic
  }

  test("trainCodebook: deterministic, unit-norm, and usable by ivfTopK") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cb1 = Similarity.trainCodebook(emb, k = 8, iters = 3)
    val cb2 = Similarity.trainCodebook(emb, k = 8, iters = 3)
    assert(rows(cb1) == rows(cb2)) // no RNG, fixed iterations
    val cents = cb1.collect().map(_.getSeq[Float](1))
    assert(cents.length == 8)
    for (c <- cents) {
      val nrm = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-3, s"norm $nrm")
    }
    val q = emb.filter($"vec_id" % 50 === 0)
    val out = Similarity.ivfTopK(q, emb, k = 5, nProbe = 3,
      codebook = Some(cb1))
    assert(out.count() > 0)
    // trained codebook should not collapse recall vs brute
    val brute = Similarity.bruteTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((brute & ivf).size.toDouble / brute.size >= 0.4)
  }

  test("labelEval: purity fractions match hand math on a planted space") {
    // two tight clusters with distinct labels + one mislabeled point
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(0.99f, 0.05f), 1),
      (2L, Array(0.98f, 0.08f), 2), // intruder in cluster A
      (10L, Array(0.0f, 1.0f), 2), (11L, Array(0.05f, 0.99f), 2),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelEval(emb.filter($"vec_id" === 0L), emb,
      k = 2).collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // query 0's two nearest are 1 (label 1) and 2 (label 2) → 1/2
    assert(got.toSeq == Seq((0L, 1, 2L, 0.5)))
  }

  test("CLI: round-3 jobs dispatch end-to-end (sample, redact, curate)") {
    val out = java.nio.file.Files.createTempDirectory("cli_r3").toString
    val in = "/root/testdata/sf0.001/documents.parquet"
    for ((job, extra) <- Seq(
        "sample" -> Map("fraction" -> "0.5"),
        "split" -> Map.empty[String, String],
        "redact" -> Map.empty[String, String],
        "repetition" -> Map.empty[String, String],
        "stratified-sample" -> Map("fractions" -> "en:1.0"),
        "cap" -> Map("max-per-stratum" -> "5"),
        "mix" -> Map("targets" -> "en:0.5,de:0.5"),
        "curate" -> Map.empty[String, String])) {
      val dir = s"$out/$job"
      graft.cli.Main.run(spark, job,
        Map("input" -> in, "output" -> dir) ++ extra)
      assert(spark.read.parquet(dir).count() > 0, job)
    }
    val embIn = "/root/testdata/sf0.001/embeddings.parquet"
    for (job <- Seq("quantize", "label-eval")) {
      val dir = s"$out/$job"
      graft.cli.Main.run(spark, job, Map("input" -> embIn, "output" -> dir))
      assert(spark.read.parquet(dir).count() > 0, job)
    }
  }

  test("plans: column pruning and filter pushdown reach the parquet scan") {
    val dir = "/root/testdata/sf0.001"
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // q1_tokens projects only (doc_id, text) from the 5-column table
    val p1 = planOf(SparkEntry.queries("q1_tokens")(spark, dir))
    assert(p1.contains("ReadSchema") &&
      p1.contains("doc_id") && p1.contains("text") &&
      !p1.contains("n_chars"), p1.linesIterator.toSeq.takeRight(5))
    // rel_anti_join pushes the orderdate filter into the orders scan
    val p2 = planOf(SparkEntry.queries("rel_anti_join")(spark, dir))
    assert(p2.contains("PushedFilters: [IsNotNull(o_custkey)") ||
      p2.contains("PushedFilters: [IsNotNull(o_orderdate)") ||
      p2.contains("GreaterThanOrEqual(o_orderdate"), p2)
    // dedup_embedding must stay BNLJ-free (spec-pinned plan shape)
    val p3 = planOf(SparkEntry.queries("dedup_embedding")(spark, dir))
    assert(!p3.contains("BroadcastNestedLoopJoin"), "BNLJ in embedding dedup")
  }

  test("foreachBatch sink lands the stream and reads back batch-consistent") {
    val out = java.nio.file.Files.createTempDirectory("fbsink_spec").toString
    val got = graft.streaming.EventsStream.hourlyViaForeachBatch(spark,
      "/root/testdata/sf0.001", out)
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val expect = events.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(rows(got) == rows(expect))
    // the sink wrote real files, partitioned by batch id
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("batch_id=")))
  }

  test("session_window merges a gap of EXACTLY the window size") {
    // pins the inclusive-boundary semantics the oracle twin encodes
    // (break at diff > gap, not >=) — an sf0.1 fixture pair at exactly
    // 1800s exposed the off-by-one
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")), // +1800s
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:30:01")), // +1801s
    ).toDF("user_id", "ts")
    val got = rows
      .groupBy(col("user_id"),
        org.apache.spark.sql.functions.session_window(col("ts"),
          "30 minutes"))
      .count().groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L)) // 1800s merges, 1801s splits
  }

  test("approxUsers: the 5% contract holds at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val events = Tables.load(spark, s"/root/testdata/$sf", "events")
      val rows = Relational.approxUsers(events).collect()
      for (r <- rows) {
        val exact = r.getLong(1)
        val approx = r.getLong(2)
        assert(math.abs(approx - exact) <= 0.05 * exact,
          s"$sf ${r.getString(0)}: approx $approx vs exact $exact")
      }
    }
  }

  test("streaming memory-sink handback preserves rows (no collect path)") {
    val got = graft.streaming.EventsStream.eventsBySegment(spark,
      "/root/testdata/sf0.001")
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val expect = events.join(customer, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_events"))
    assert(rows(got) == rows(expect))
  }
}
