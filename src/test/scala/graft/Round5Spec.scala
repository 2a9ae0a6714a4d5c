package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.CompatIo
import graft.operators.{TfIdfOps, WikiText}

/** Round-5 behavior pins: the raw wikiextractor parse quirks on the
  * committed fixture (S1/P1/P2 — the gate queries' Spark side), the
  * ", "-CSV round-trip identity (S2/S6), and the count-desc output
  * ordering (T4) that the order-insensitive hash gate cannot see. */
class Round5Spec extends SparkSpec {

  private def fixtureDocs = {
    val lines = spark.read.text(SparkEntry.WikiFixturePath)
      .filter(length(trim(col("value"))) > 0)
    WikiText.parse(lines)
  }

  // ---- §1.3 parse quirks on the committed fixture ----

  test("wiki parse: doc ids extracted, one row per fixture line") {
    val ids = fixtureDocs.select("doc_id").collect().map(_.getString(0))
    assert(ids.sorted.toSeq == (9001 to 9010).map(_.toString))
  }

  test("wiki parse: literal '>' truncates the body (reference Main.java:83)") {
    val body = fixtureDocs.filter(col("doc_id") === "9002")
      .select("body").head().getString(0)
    assert(body == "alpha beta") // everything after the inline '>' is gone
  }

  test("wiki parse: trailing `</doc` fuses the last token (DocInfo.java:25-26)") {
    // every non-truncated fixture doc ends "... include</doc" → the
    // normalized token stream must contain "includedoc", never "include"
    val words = WikiText.tokens(fixtureDocs, textCol = "body")
      .select("word").distinct().collect().map(_.getString(0)).toSet
    assert(words.contains("includedoc"))
    assert(!words.contains("include"))
  }

  test("wiki parse: punctuation-only tokens drop but inflate the TF denominator") {
    // doc 9003 body: "common tokens repeat repeat repeat -- ??? 42 alpha include</doc"
    // raw_len counts all 10 space-split fields; '--', '???', '42'
    // normalize to empty and drop from the token stream
    val toks = WikiText.tokensWithRawLen(fixtureDocs, textCol = "body")
      .filter(col("doc_id") === "9003")
    val rawLen = toks.select("raw_len").head().getLong(0)
    val n = toks.count()
    assert(rawLen == 10)
    assert(n == 7) // common tokens repeat×3 alpha includedoc
  }

  // ---- streaming late-data watermark drops (stream_late_drop gate) ----

  test("watermark drops: `end <= W` late rows dropped, batch N filtered vs W(N-2)") {
    import spark.implicits._
    def ev(id: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), typ)
    // batch 0 sets the watermark to max(ts) - 1 min = 12:00:00 exactly
    val b0 = Seq(
      ev(1, "2026-01-01 10:30:00", "a"),
      ev(2, "2026-01-01 12:01:00", "a")
    ).toDF("event_id", "ts", "event_type")
    // batch 1: carrier — its own rows pass (filtered vs MIN_VALUE)
    val b1 = Seq(ev(6, "2026-01-01 10:45:00", "mid"))
      .toDF("event_id", "ts", "event_type")
    // batch 2: late arrivals straddling the boundary
    val b2 = Seq(
      ev(3, "2026-01-01 10:15:00", "lt"), // window end 11:00 < W → drop
      ev(4, "2026-01-01 11:15:00", "eq"), // window end 12:00 == W → drop
      ev(5, "2026-01-01 12:15:00", "gt")  // window end 13:00 > W → keep
    ).toDF("event_id", "ts", "event_type")
    val dir = Files.createTempDirectory("graft_late_").toString
    graft.streaming.EventsStream.stageBatches(dir, b0, b1, b2)
    val out = rows(
      graft.streaming.EventsStream.hourlyCountsStaged(spark, dir))
    assert(out == Seq(
      "2026-01-01 10:00:00|a|1",
      "2026-01-01 10:00:00|mid|1",
      "2026-01-01 12:00:00|a|1",
      "2026-01-01 12:00:00|gt|1").sorted)
  }

  test("stream_late_drop gate actually drops rows vs the no-drop twin (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val stage = Files.createTempDirectory("graft_lategate_").toString
    val dropped = graft.streaming.EventsStream
      .hourlyCountsLate(spark, dir, stage)
      .agg(sum("n_events")).head().getLong(0)
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(dropped < total, "watermark dropped nothing — gate is vacuous")
  }

  // ---- sparse TF-IDF doc similarity (sim_docs_tfidf gate) ----

  test("tfIdfDocTopK: clones rank first at cos 1.0; no pair without shared terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"), (4L, "alpha delta")
    ).toDF("doc_id", "text")
    val got = operators.Similarity
      .tfIdfDocTopK(docs, docs.select("doc_id"), k = 3)
      .select("query_id", "neighbor_id", "cos", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // exact clones: cosine 1.0, rank 1, both directions
    assert(got.contains((1L, 2L, 1.0, 1L)) && got.contains((2L, 1L, 1.0, 1L)))
    // docs 1 and 3 share no term — never paired
    assert(!got.exists(t => t._1 == 1L && t._2 == 3L))
    // doc 4 bridges both clusters and self never appears
    assert(got.forall(t => t._1 != t._2))
  }

  // ---- greedy sequence packing (text_pack gate) ----

  test("packGreedy: hand-computed bins, boundaries and oversize docs") {
    import spark.implicits._
    // one shard (shards=1), budget 10, docs in id order with token
    // counts 4, 6, 3, 12, 10, 1:
    //   id 1 (4)  -> bin 0 off 0   (fill 4)
    //   id 2 (6)  -> bin 0 off 4   (fill 10 — exact fit stays: rule is >)
    //   id 3 (3)  -> bin 1 off 0
    //   id 4 (12) -> oversize: closes bin 1, takes bin 2 alone
    //   id 5 (10) -> n == budget -> oversize branch: bin 3 alone
    //   id 6 (1)  -> bin 4 off 0
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e f"), (3L, "a b c"),
      (4L, "a b c d e f g h i j k l"), (5L, "a b c d e f g h i j"),
      (6L, "a")
    ).toDF("doc_id", "text")
    val got = operators.Packing.packGreedy(docs, budget = 10L, shards = 1)
      .select("doc_id", "bin", "bin_offset", "n_tokens")
    assert(rows(got) == Seq(
      "1|0|0|4", "2|0|4|6", "3|1|0|3", "4|2|0|12", "5|3|0|10", "6|4|0|1"
    ).sorted)
  }

  test("packGreedy invariants on sf0.001: capacity, offsets, coverage") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val packed = operators.Packing
      .packGreedy(docs, budget = 256L, shards = 8).persist()
    assert(packed.count() == docs.count()) // every doc assigned exactly once
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"),
        max("n_tokens").as("max_n"))
      .collect()
    bins.foreach { r =>
      val (fill, nDocs, maxN) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      // a bin either fits the budget or is a single oversize doc
      assert(fill <= 256L || (nDocs == 1L && maxN >= 256L),
        s"overfull bin: $r")
    }
    // offsets are the running sum of the bin's docs in doc_id order
    val badOffsets = packed
      .withColumn("expected_off",
        sum("n_tokens").over(
          Window.partitionBy("shard", "bin").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("bin_offset") =!= coalesce(col("expected_off"), lit(0L)))
    assert(badOffsets.isEmpty, "bin_offset must be the running fill")
    packed.unpersist()
  }

  // ---- ", "-CSV round-trip identity + T4 ordering ----

  test("refCsv round-trip is the identity on Q6 (sf0.001)") {
    val q6 = TfIdfOps.tfIdfPipeline(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val out = Files.createTempDirectory("graft_rt_").toString
    CompatIo.writeRefCsv(q6,
      Seq("doc_id", "word", "cnt", "tf", "tf_idf"), out)
    val back = CompatIo.readRefCsv(spark, out, Seq(
      "doc_id" -> "bigint", "word" -> "string", "cnt" -> "bigint",
      "tf" -> "double", "tf_idf" -> "double"))
    assert(rows(back) == rows(q6.select("doc_id", "word", "cnt", "tf",
      "tf_idf")))
  }

  test("T4: written files keep count-desc (word-asc tie) order per doc") {
    val q6 = TfIdfOps.tfIdfPipeline(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    // per-doc compatibility layout: one directory per doc_id, rows
    // "word, cnt, tf, tf_idf"
    val perDoc = Files.createTempDirectory("graft_t4pd_").toString
    CompatIo.writeRefCsv(q6,
      Seq("doc_id", "word", "cnt", "tf", "tf_idf"), perDoc, perDoc = true)
    val docDirs = new java.io.File(perDoc).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("doc_id="))
    assert(docDirs.length > 10)
    var checked = 0
    docDirs.foreach { d =>
      val rows = d.listFiles().filter(_.getName.endsWith(".txt")).toSeq
        .flatMap(f => Files.readAllLines(f.toPath).asScala)
        .filter(_.nonEmpty).map(_.split(", ", -1))
      assert(rows.forall(_.length == 4), s"${d.getName} field count")
      val order = rows.map(r => (-r(1).trim.toLong, r(0)))
      assert(order == order.sorted, s"${d.getName} not count-desc/word-asc")
      checked += rows.size
    }
    assert(checked == q6.count())

    // single-table layout: each part file is (doc_id, cnt desc, word asc)
    // sorted, so every doc's rows are contiguous and count-desc
    val single = Files.createTempDirectory("graft_t4st_").toString
    CompatIo.writeRefCsv(q6,
      Seq("doc_id", "word", "cnt", "tf", "tf_idf"), single)
    val partFiles = new java.io.File(single).listFiles()
      .filter(_.getName.endsWith(".txt")).toSeq
    assert(partFiles.nonEmpty)
    partFiles.foreach { f =>
      val rows = Files.readAllLines(f.toPath).asScala
        .filter(_.nonEmpty).map(_.split(", ", -1)).toSeq
      assert(rows.forall(_.length == 5), s"${f.getName} field count")
      val order = rows.map(r => (r(0).trim.toLong, -r(2).trim.toLong, r(1)))
      assert(order == order.sorted, s"${f.getName} not per-doc count-desc")
    }
  }

  // ---- duplicated-span (substring) dedup ----

  test("duplicatedSpans: cross-doc shared 5-gram marks both docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),          // shares "a b c d e" with doc 2
      (2L, "x x a b c d e z"),
      (3L, "unique words only here none match")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicatedSpans(docs, w = 5)
    assert(rows(out) == Seq(
      "1|4|1|5|0.63",   // 4 windows, 1 dup, 5 of 8 tokens covered
      "2|4|1|5|0.63",
      "3|2|0|0|0.0"))
  }

  test("duplicatedSpans: overlapping windows union without double-count") {
    import spark.implicits._
    // every window of "p q p q ..." repeats intra-doc: all 6 windows
    // are duplicated, but union coverage is exactly the 10 tokens
    val docs = Seq((1L, "p q p q p q p q p q")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicatedSpans(docs, w = 5)
    assert(rows(out) == Seq("1|6|6|10|1.0"))
  }

  test("duplicatedSpans: shorter-than-w clone pair clamps coverage to doc length") {
    import spark.implicits._
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.duplicatedSpans(docs, w = 5)
    // one whole-text window each, duplicated; dup_tokens clamps 5 → 2
    assert(rows(out) == Seq("1|1|1|2|1.0", "2|1|1|2|1.0"))
  }

  // ---- deterministic shard assignment ----

  test("shardAssign: total permutation — dense 1..n positions per shard") {
    import spark.implicits._
    val df = (1L to 500L).toDF("doc_id")
    val out = graft.operators.Sampling.shardAssign(df, 8).cache()
    assert(out.count() == 500)
    // every shard's positions are exactly 1..count(shard)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .collect()
    assert(perShard.nonEmpty && perShard.forall(r =>
      r.getAs[Long]("mn") == 1L && r.getAs[Long]("mx") == r.getAs[Long]("n")
        && r.getAs[Long]("d") == r.getAs[Long]("n")))
    // deterministic: a second run is byte-identical
    val again = graft.operators.Sampling.shardAssign(df, 8)
    assert(rows(out) == rows(again))
    out.unpersist()
  }

  test("shardAssign: NULL keys drop; numShards=1 is one global order") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L), Some(3L)).toDF("doc_id")
    val out = graft.operators.Sampling.shardAssign(df, 1)
    assert(out.count() == 3)
    assert(rows(out.select("shard")).distinct == Seq("0"))
    assert(rows(out.select("pos")) == Seq("1", "2", "3"))
  }

  // ---- banded range join ----

  test("rangeJoin: matches naive join-then-filter exactly, no duplicates") {
    import spark.implicits._
    val pts = (0L to 400L by 7).map(p => (p, s"p$p")).toDF("pt", "ptag")
    val ivs = Seq((0L, 10L, 25L), (1L, 90L, 90L), (2L, 100L, 260L),
      (3L, 399L, 410L), (4L, 50L, 40L), // backwards: matches nothing
      (5L, -30L, 5L)).toDF("iv_id", "lo", "hi")
    val banded = graft.operators.Relational.rangeJoin(
      pts, "pt", ivs, "lo", "hi", bucketWidth = 64)
    val naive = pts.join(ivs,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    assert(rows(banded) == rows(naive))
    assert(banded.count() == banded.distinct().count())
  }

  // ---- product-quantization ANN ----

  test("pqTopK: unbounded shortlist IS the exact L2 ranking") {
    import spark.implicits._
    graft.functions.VecExpressions.register(spark)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    // naive exact-L2 reference, computed a completely different way
    // (cross join + window) than pqTopK's heap ranking
    val qv = q.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val d2 = graft.operators.Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * graft.operators.Similarity.dot(col("qv"), col("embedding")) +
      graft.operators.Similarity.dot(col("embedding"), col("embedding"))
    val naive = e.crossJoin(qv)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        d2.as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("d2").asc, col("neighbor_id").asc)).cast("long"))
      .filter(col("rank") <= 10)
      .drop("d2")
    val pq = graft.operators.Similarity.pqTopK(q, e, rerank = Int.MaxValue)
    assert(rows(pq) == rows(naive))
  }

  test("pqTopK: recall@10 vs exact L2 holds the measured floor (sf0.1)") {
    // RecallProbe (2026-08-12): rerank=40 → 0.27, 160 → 0.57 (the
    // default), 400 → 0.81 on the near-uniform fixture — the hardest
    // regime for coarse 8-byte codes. Guards against a quantization or
    // ADC change silently gutting the shortlist while the fixed-plan
    // oracle stays green.
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    val ref = graft.operators.Similarity
      .pqTopK(q, e, rerank = Int.MaxValue)
      .select("query_id", "neighbor_id").persist()
    val n = ref.count().toDouble
    val hit = graft.operators.Similarity.pqTopK(q, e)
      .select("query_id", "neighbor_id")
      .join(ref, Seq("query_id", "neighbor_id")).count()
    ref.unpersist()
    val recall = hit / n
    assert(recall >= 0.50, s"pqTopK recall@10 degraded: $recall < 0.50")
  }

  test("ivfPqTopK: recall@10 vs exact L2 holds the measured floor (sf0.1)") {
    // RecallProbe (2026-08-12): 0.4375 at sf0.1 (coarse 4-of-16
    // pruning ≈ 25% scan compounded with the PQ shortlist)
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    val ref = graft.operators.Similarity
      .pqTopK(q, e, rerank = Int.MaxValue)
      .select("query_id", "neighbor_id").persist()
    val n = ref.count().toDouble
    val hit = graft.operators.Similarity.ivfPqTopK(q, e)
      .select("query_id", "neighbor_id")
      .join(ref, Seq("query_id", "neighbor_id")).count()
    ref.unpersist()
    val recall = hit / n
    assert(recall >= 0.35, s"ivfPqTopK recall@10 degraded: $recall < 0.35")
  }

  test("ivfPqTopK with nProbe=all lists IS pqTopK (pruning no-op)") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    val pq = graft.operators.Similarity.pqTopK(q, e)
    val ivfpq = graft.operators.Similarity.ivfPqTopK(q, e,
      nCentroids = 16, nProbe = 16)
    assert(rows(ivfpq) == rows(pq))
  }

  // ---- tokenize-to-ids ----

  test("vocab + tokenIds: ranked ids, dense positions, OOV=0") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the dog !!! the"), (2L, "cat mouse"))
      .toDF("doc_id", "text")
    val v = graft.operators.TextStats.vocab(docs, maxVocab = 3)
    // counts: the=3, cat=2, dog=1, mouse=1; cap 3 keeps (the, cat, dog)
    assert(rows(v) == Seq("1|the|3", "2|cat|2", "3|dog|1"))
    val ids = graft.operators.TextStats.tokenIds(docs, v)
    // "!!!" normalizes to empty and drops; positions stay dense;
    // mouse is out-of-vocabulary -> 0
    assert(rows(ids) == Seq(
      "1|1|1", "1|2|2", "1|3|1", "1|4|3", "1|5|1",
      "2|1|2", "2|2|0"))
  }

  // ---- salted hot-key join ----

  test("saltedJoin == plain join on a skewed key distribution") {
    import spark.implicits._
    // 300 of 320 probe rows share one hot key
    val probe = ((1L to 300L).map(i => (i, 7L)) ++
      (301L to 320L).map(i => (i, i % 5))).toDF("pid", "k")
    val build = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (99L, "none"))
      .toDF("bk", "payload")
    val salted = graft.operators.Skew.saltedJoin(
      probe, build, "k", "bk", Seq("pid"), salts = 8)
    val plain = probe.join(build, col("k") === col("bk"))
    assert(rows(salted) == rows(plain))
    assert(salted.count() == salted.distinct().count())
  }

  test("rangeJoin: rejects colliding column names") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("x", "shared")
    val b = Seq((1L, 2L, 3L)).toDF("lo", "hi", "shared")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Relational.rangeJoin(a, "x", b, "lo", "hi", 10)
    }
    assert(e.getMessage.contains("shared"))
  }
}
