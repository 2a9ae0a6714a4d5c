package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, Similarity, TextStats}

/** Round-9 pins, batch 3: the count-min-sketch artifact (sparse md5
  * bucketing, linear mergeability, the est ≥ exact guarantee).
  */
class Round20Spec extends SparkSpec {

  import spark.implicits._

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_spec_$tag").toString

  // --- Relational.cmsBuild / cmsEstimate / artifact cycle ---

  test("cmsBuild: sparse sketch — total counter mass = depth × rows, " +
    "row count bounded by depth × distinct keys") {
    val df = Seq(1L, 1L, 1L, 2L, 3L).toDF("user_id")
    val sk = Relational.cmsBuild(df, "user_id").collect()
    assert(sk.map(_.getAs[Long]("cnt")).sum ===
      Relational.CmsDepth.toLong * 5L)
    assert(sk.length <= Relational.CmsDepth * 3)
    assert(sk.forall(r => r.getAs[Long]("b") >= 0 &&
      r.getAs[Long]("b") < Relational.CmsWidth))
  }

  test("cmsEstimate: estimate ≥ exact for every probe, and exact when " +
    "no bucket collides") {
    val df = Seq.fill(7)(10L).union(Seq.fill(3)(20L)).union(Seq(30L))
      .toDF("user_id")
    val sketch = Relational.cmsBuild(df, "user_id")
    val probes = df.groupBy(col("user_id").cast("string").as("k"))
      .agg(count(lit(1)).as("n_exact"))
    val est = Relational.cmsEstimate(sketch, probes).collect()
    assert(est.length === 3)
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n_exact"))
    }
    // 3 keys in 1024 buckets: if ANY depth row is collision-free the
    // min equals exact — with 4 independent rows that's certain here
    est.foreach { r =>
      assert(r.getAs[Long]("est") === r.getAs[Long]("n_exact"))
    }
  }

  test("cms artifact: write(pre) + merge(delta) ≡ from-scratch sketch " +
    "of the union (counters sum linearly)") {
    val pre = Seq(1L, 2L, 2L, 3L).toDF("user_id")
    val delta = Seq(2L, 3L, 4L).toDF("user_id")
    val dir = scratch("cms")
    Relational.cmsArtifactWrite(pre, "user_id", dir)
    val merged = Relational.cmsArtifactMerge(delta, "user_id", dir)
      .orderBy("d", "b").collect()
    val scratchBuilt = Relational.cmsBuild(pre.union(delta), "user_id")
      .orderBy("d", "b").collect()
    assert(merged.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq ===
      scratchBuilt.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq)
  }

  // --- TextStats.textRank ---

  test("textRank: the co-occurrence hub outranks leaf words") {
    val docs = Seq((1L, "a b a c a d")).toDF("doc_id", "text")
    val out = TextStats.textRank(docs, minCount = 1L, iters = 3, k = 10)
      .collect()
    assert(out.map(_.getAs[String]("word")).toSet === Set("a", "b", "c", "d"))
    // ordered rank desc — the hub 'a' (3 distinct neighbors) leads
    assert(out.head.getAs[String]("word") === "a")
    assert(out.head.getAs[Long]("rank") >
      out.last.getAs[Long]("rank"))
  }

  test("textRank: self-loops dropped — a two-word symmetric graph " +
    "ranks both words equally") {
    val docs = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val out = TextStats.textRank(docs, minCount = 1L, iters = 3, k = 10)
      .collect()
    assert(out.map(_.getAs[String]("word")).toSet === Set("x", "y"))
    assert(out(0).getAs[Long]("rank") === out(1).getAs[Long]("rank"))
  }

  test("textRank: minCount prunes low-support edges and their " +
    "orphaned nodes") {
    val docs = Seq((1L, "a b a b a d")).toDF("doc_id", "text")
    // (a,b) co-occurs 4x, (a,d) once — minCount=2 drops d entirely
    val out = TextStats.textRank(docs, minCount = 2L, iters = 2, k = 10)
      .collect()
    assert(out.map(_.getAs[String]("word")).toSet === Set("a", "b"))
  }

  // --- Similarity.knnGraphMutual ---

  test("knnGraphMutual: asymmetric edges are dropped, mutual pairs " +
    "keep their round2 cosine") {
    def v(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(8 - xs.length)(0.0)).map(_.toFloat).toArray
    // v1↔v2 are each other's nearest; v3's nearest is v2 but v2's is
    // v1 — the (2,3) edge is one-directional and must not survive
    val emb = Seq(
      (1L, v(1.0)), (2L, v(1.0, 0.05)), (3L, v(0.5, 0.8)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnGraphMutual(emb, k = 1).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("u") === 1L)
    assert(out(0).getAs[Long]("v") === 2L)
    assert(out(0).getAs[Double]("cos") > 0.99)
  }

  test("knnGraphMutual: k=2 on a tight triple keeps all three edges") {
    def v(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(8 - xs.length)(0.0)).map(_.toFloat).toArray
    val emb = Seq(
      (1L, v(1.0, 0.01)), (2L, v(1.0, 0.02)), (3L, v(1.0, 0.03)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnGraphMutual(emb, k = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  // --- EventsStream.decontamIngest ---

  test("decontamIngest: the streamed index tail emits exactly the " +
    "batch decontaminate rows") {
    val dir = "/root/testdata/sf0.001"
    val d = Tables.load(spark, dir, "documents")
    val batch = graft.operators.Dedup.decontaminate(
      d.filter(col("doc_id") % 20 =!= 0),
      d.filter(col("doc_id") % 20 === 0), n = 4)
    val streamed = graft.streaming.EventsStream.decontamIngest(
      spark, dir, scratch("sdidx"))
    assert(rows(streamed) === rows(batch))
    assert(rows(streamed).nonEmpty)
  }

  // --- CompatIo stats-skipping index ---

  test("statsIndex: the plan skips files, the skipped read equals the " +
    "full-scan filter, an empty plan short-circuits") {
    import graft.io.CompatIo
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val root = scratch("skip")
    CompatIo.writeSortedRange(li, s"$root/data", 8, Seq("l_orderkey"))
    CompatIo.statsIndexWrite(spark, s"$root/data", s"$root/idx",
      "l_orderkey")
    val idx = spark.read.parquet(s"$root/idx")
    assert(idx.count() === 8L)
    // a narrow range on the sorted layout must prune most files
    val planned = CompatIo.skippingPlan(spark, s"$root/idx", 100L, 200L)
    assert(planned.count() >= 1L && planned.count() <= 2L)
    val skipped =
      CompatIo.readWithSkipping(spark, s"$root/data", s"$root/idx",
        "l_orderkey", 100L, 200L)
    val full = spark.read.parquet(s"$root/data")
      .filter(col("l_orderkey").between(100L, 200L))
    assert(rows(skipped) === rows(full))
    assert(rows(skipped).nonEmpty)
    // a range outside every file's stats reads nothing
    val none = CompatIo.readWithSkipping(spark, s"$root/data",
      s"$root/idx", "l_orderkey", 10000000L, 20000000L)
    assert(none.count() === 0L)
  }

  // --- Relational.lastTouchAttribution ---

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toSeq.toDF("event_id", "sec", "user_id", "event_type")
      .select(col("event_id"),
        expr("timestamp_micros(sec * 1000000)").as("ts"),
        col("user_id"), col("event_type"))

  test("lastTouchAttribution: latest in-horizon touch wins; ties on " +
    "ts break to the higher event_id") {
    val events = ev(
      (1L, 100L, 7L, "click"),
      (2L, 200L, 7L, "view"),
      (3L, 200L, 7L, "click"), // same ts as 2 — higher id wins
      (4L, 300L, 7L, "purchase"))
    val out = Relational.lastTouchAttribution(events).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("touch_id") === 3L)
    assert(out(0).getAs[String]("touch_type") === "click")
    assert(out(0).getAs[Long]("mins_before") === 1L) // 100s div 60
  }

  test("lastTouchAttribution: horizon excluded and strictly-earlier " +
    "semantics") {
    val h = 7L * 86400L
    val events = ev(
      (1L, 0L, 7L, "click"),              // h+100s before — too old
      (2L, h + 100L, 7L, "purchase"),     // nothing in horizon
      (3L, h + 100L, 7L, "view"),         // same instant — NOT earlier
      (4L, h + 200L, 8L, "purchase"))     // other user — no touches
    val out = Relational.lastTouchAttribution(events)
      .orderBy("event_id").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("touch_id")))
      assert(r.isNullAt(r.fieldIndex("mins_before")))
    }
  }

  // --- Similarity.knnComponents ---

  test("knnComponents: two tight pairs form two clusters labeled by " +
    "their min vec_id; the far singleton is omitted") {
    def v(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(8 - xs.length)(0.0)).map(_.toFloat).toArray
    val emb = Seq(
      (1L, v(1.0, 0.01)), (2L, v(1.0, 0.02)),     // pair A
      (10L, v(0.01, 1.0)), (11L, v(0.02, 1.0)),   // pair B
      (99L, v(1.0, 1.0, 5.0)))                    // bridge-ish loner
      .toDF("vec_id", "embedding")
    val out = Similarity.knnComponents(emb, k = 1, maxRounds = 5)
      .collect()
    val comp = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) === 1L && comp(2L) === 1L)
    assert(comp(10L) === 10L && comp(11L) === 10L)
    // 99's nearest is not reciprocated by either tight pair member
    assert(!comp.contains(99L))
  }

  // --- Relational histogram artifact ---

  test("histQuantiles: hand-computed p50/p90/p99 buckets") {
    // ten values in bucket 0 (0..8), ten in bucket 2 (16..24)
    val ev = (1 to 10).map(i => ("a", 1.0 + i * 0.1)) ++
      (1 to 10).map(i => ("a", 17.0 + i * 0.1))
    val df = ev.toDF("event_type", "value")
    val q = Relational.histQuantiles(Relational.histBuild(df))
      .orderBy("p").collect()
    // total 20: p50 target 10 → cum 10 at bucket 0; p90 target 18 and
    // p99 target 20 (ceil semantics via cross-multiplication) → bucket 2
    assert(q.map(r => (r.getAs[Double]("p"), r.getAs[Long]("bucket"),
      r.getAs[Double]("est_upper"))).toSeq ===
      Seq((0.5, 0L, 8.0), (0.9, 2L, 24.0), (0.99, 2L, 24.0)))
  }

  test("hist artifact: write(pre) + merge(delta) ≡ from-scratch build") {
    val pre = Seq(("a", 1.0), ("a", 20.0), ("b", 5.0))
      .toDF("event_type", "value")
    val delta = Seq(("a", 21.0), ("b", 2000.0), ("c", 3.0))
      .toDF("event_type", "value")
    val dir = scratch("hist")
    Relational.histArtifactWrite(pre, dir)
    val merged = Relational.histArtifactMerge(delta, dir)
    assert(rows(merged) ===
      rows(Relational.histBuild(pre.union(delta))))
    // 2000 (bucket 250 unclamped) clamps into the overflow bucket 127
    assert(merged.filter(col("bucket") === 127L).count() === 1L)
  }

  // --- Similarity.knnRecall ---

  test("knnRecall: identical vectors land in one bucket — perfect " +
    "recall; recall is always in [0, 1]") {
    def v(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(8 - xs.length)(0.0)).map(_.toFloat).toArray
    // 10 near-clones: every true neighbor shares the query's bucket
    val emb = (0L to 9L).map(i => (i * 10L, v(1.0, 0.001 * i)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnRecall(emb, k = 3, queryMod = 10).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0)
      assert(r.getAs[Long]("n_hits") === 3L)
    }
  }

  // --- TextStats.sentences ---

  test("sentences: terminator runs split, order preserved, empties " +
    "dropped, leading terminators skipped") {
    val docs = Seq(
      (1L, "Hello world. How are you?? Fine! ok"),
      (2L, "...Just one"),
      (3L, "!!!")).toDF("doc_id", "text")
    val out = TextStats.sentences(docs)
      .orderBy("doc_id", "sent_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[String]("sentence")).toSeq ===
      Seq("Hello world.", "How are you??", "Fine!", "ok"))
    assert(d1.map(_.getAs[Long]("sent_idx")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_.getAs[Long]("n_tokens")).toSeq === Seq(2L, 3L, 1L, 1L))
    // doc 2: the leading "..." attaches to no chunk; one sentence
    assert(out.filter(_.getLong(0) == 2L)
      .map(_.getAs[String]("sentence")).toSeq === Seq("Just one"))
    // doc 3: terminators only — no sentence at all
    assert(!out.exists(_.getLong(0) == 3L))
  }

  // --- TextStats LM artifact ---

  test("lmScoreFromArtifact: a frozen model scores unseen docs — " +
    "modeled bigrams only, unmodeled docs drop") {
    import graft.operators.TextStats
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val dir = scratch("lm")
    TextStats.lmArtifactWrite(train, dir)
    // "a b" is modeled 3x of c1(a)=3 → lp=0 → score 0.0;
    // "z z" shares no bigram with the model → doc 11 drops
    val unseen = Seq((10L, "a b"), (11L, "z z")).toDF("doc_id", "text")
    val out = TextStats.lmScoreFromArtifact(unseen, dir).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("doc_id") === 10L)
    assert(out(0).getAs[Double]("lm_score") === 0.0)
  }

  // --- CompatIo incremental manifest-diff scan ---

  test("incremental scan: the manifest diff reads only the landed " +
    "delta; appending stats advances the cursor to empty") {
    import graft.io.CompatIo
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val root = scratch("inc")
    CompatIo.writeSortedRange(li.filter(col("l_orderkey") % 3 =!= 0),
      s"$root/data", 3, Seq("l_orderkey"))
    CompatIo.statsIndexWrite(spark, s"$root/data", s"$root/idx",
      "l_orderkey")
    val delta = li.filter(col("l_orderkey") % 3 === 0)
    delta.repartition(2).write.mode("append").parquet(s"$root/data")
    val inc = CompatIo.readIncrement(spark, s"$root/data", s"$root/idx")
    assert(rows(inc) === rows(delta))
    // advance the cursor: stats of the 2 new files append to the index
    CompatIo.statsIndexAppend(spark, s"$root/data", s"$root/idx",
      "l_orderkey")
    assert(spark.read.parquet(s"$root/idx").count() === 5L)
    assert(CompatIo.readIncrement(spark, s"$root/data", s"$root/idx")
      .count() === 0L)
  }

  // --- EventsStream.cmsMaintain ---

  test("cmsMaintain: the 3-batch maintained sketch serves the same " +
    "audit as the batch artifact") {
    val dir = "/root/testdata/sf0.001"
    val maintained = graft.streaming.EventsStream.cmsMaintain(
      spark, dir, scratch("cmsstage"), scratch("cmsart2"))
    val batch = Relational.cmsArtifactAudit(
      Tables.load(spark, dir, "events"), scratch("cmsart3"))
    assert(rows(maintained) === rows(batch))
    assert(rows(maintained).nonEmpty)
  }

  test("cmsArtifactAudit: top-20 heavy hitters, overcount nonnegative") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val out = Relational.cmsArtifactAudit(ev, scratch("cmsa")).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach(r => assert(r.getAs[Long]("overcount") >= 0L))
  }
}
