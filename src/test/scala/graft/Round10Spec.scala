package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational, TextStats}

/** Round-6 ninth-session behavior pins: content-defined chunking
  * (insertion robustness), SemDeDup semantic dedup (cluster blocking +
  * lowest-id exemplar), gap-aware rolling revenue (calendar RANGE
  * frame), and the single-pass column profiler (canonical renderings).
  */
class Round10Spec extends SparkSpec {

  import spark.implicits._

  // ---- text_cdc_chunk: cdcChunk ----

  private def doc(id: Long, toks: Seq[String]) =
    Seq((id, toks.mkString(" "))).toDF("doc_id", "text")

  test("cdcChunk: chunks partition the token stream in order") {
    val toks = (1 to 100).map(i => s"w$i")
    val out = TextStats.cdcChunk(doc(1, toks), avgTokens = 16).persist()
    // token counts sum back to the doc length
    assert(out.agg(sum("n_chunk_tokens")).head().getLong(0) == 100L)
    // chunk ids are contiguous from 0
    val ids = out.select("chunk_id").as[Long].collect().sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
    out.unpersist()
  }

  test("cdcChunk: boundaries are local — insertion only re-chunks " +
    "the edited region; fixed-stride chunking shifts every chunk") {
    val a = (1 to 200).map(i => s"w$i")
    val b = a.take(100) ++ (1 to 20).map(i => s"x$i") ++ a.drop(100)
    def cdcMd5s(toks: Seq[String]): Set[String] =
      TextStats.cdcChunk(doc(1, toks), avgTokens = 16)
        .select("chunk_md5").as[String].collect().toSet
    def fixedMd5s(toks: Seq[String]): Set[String] =
      TextStats.chunk(doc(1, toks), chunkTokens = 16, overlap = 0)
        .select(md5(col("chunk_text"))).as[String].collect().toSet
    val (ca, cb) = (cdcMd5s(a), cdcMd5s(b))
    // at most the two chunks overlapping the insertion point change
    assert((ca -- cb).size <= 2,
      s"cdc lost ${(ca -- cb).size} of ${ca.size} chunks")
    val (fa, fb) = (fixedMd5s(a), fixedMd5s(b))
    // 20 inserted tokens is not a stride multiple: every chunk at or
    // past the insertion shifts — only the pre-edit prefix survives
    assert((fa & fb).size < (ca & cb).size,
      s"fixed shared ${(fa & fb).size} !< cdc shared ${(ca & cb).size}")
  }

  test("cdcChunk: zero-token docs emit nothing; avgTokens validated") {
    val empty = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    assert(TextStats.cdcChunk(empty).count() == 0)
    intercept[IllegalArgumentException] {
      TextStats.cdcChunk(doc(1, Seq("a")), avgTokens = 1)
    }
  }

  // ---- dedup_semantic: semanticDedup ----

  private def emb(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("semanticDedup: within-cluster near-dups drop, lowest id kept") {
    val df = emb(
      1L -> Array(1f, 0f, 0f, 0f),      // centroid c1
      2L -> Array(0f, 1f, 0f, 0f),      // centroid c2
      3L -> Array(1f, 0.01f, 0f, 0f),   // ~dup of 1 in c1
      4L -> Array(0f, 1f, 0.01f, 0f),   // ~dup of 2 in c2
      5L -> Array(-1f, 0.2f, 0f, 0f),   // lands in c2, far from all
      6L -> Array(0f, 0f, 0f, 0f))      // zero vector: excluded
    val got = Dedup.semanticDedup(df, threshold = 0.5, nClusters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true), (3L, 1L, false),
      (4L, 2L, false), (5L, 2L, true)))
  }

  test("semanticDedup: identical vectors keep only the lowest id") {
    val v = Array(0.6f, 0.8f, 0f, 0f)
    val df = emb(10L -> v, 11L -> v, 12L -> v, 13L -> Array(0f, 0f, 1f, 0f))
    val keeps = Dedup.semanticDedup(df, nClusters = 2)
      .filter(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(keeps == Set(10L, 13L))
  }

  // ---- rel_rolling_stats: rollingDailyRevenue ----

  private def orders(rows: (String, Double)*) =
    rows.toSeq.toDF("dt", "o_totalprice")
      .select(to_timestamp(col("dt")).as("o_orderdate"),
        col("o_totalprice"))

  test("rollingDailyRevenue: calendar RANGE frame shrinks across gaps") {
    val df = orders(
      ("2024-01-01 10:00:00", 60.0), ("2024-01-01 11:00:00", 40.0),
      ("2024-01-02 09:00:00", 50.0), ("2024-01-10 12:00:00", 30.0))
    val got = Relational.rollingDailyRevenue(df, windowDays = 7)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got == Set(
      ("2024-01-01", 100.0, 100.0, 100.0, 1L),
      ("2024-01-02", 50.0, 150.0, 75.0, 2L),
      // the 7-day window behind day 10 holds no other order day: a
      // ROWS frame would have reached back to Jan 2 here
      ("2024-01-10", 30.0, 30.0, 30.0, 1L)))
  }

  test("rollingDailyRevenue: windowDays=1 degenerates to the daily agg") {
    val df = orders(("2024-01-01 10:00:00", 10.0),
      ("2024-01-05 10:00:00", 20.0))
    val got = Relational.rollingDailyRevenue(df, windowDays = 1)
    assert(got.filter(col("revenue") =!= col("trail_sum")).count() == 0)
    assert(got.filter(col("n_days") =!= 1).count() == 0)
    intercept[IllegalArgumentException] {
      Relational.rollingDailyRevenue(df, windowDays = 0)
    }
  }

  // ---- rel_profile: profile ----

  test("profile: per-column stats with canonical renderings") {
    val df = Seq(
      (Option(1L), Option("b"), Option(1.5), Option(1704067200L)),
      (Option(2L), Option("a"), Option(2.25), Option.empty[Long]),
      (Option.empty[Long], Option("a"), Option.empty[Double],
        Option(1704153600L)))
      .toDF("id", "s", "d", "e")
      .withColumn("ts", timestamp_seconds(col("e"))).drop("e")
      .withColumn("z", lit(null).cast("double"))
    val got = Relational.profile(df, Seq("id", "s", "d", "ts", "z"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSet
    assert(got == Set(
      ("id", 3L, 1L, 2L, "1", "2"),
      ("s", 3L, 0L, 2L, "a", "b"),
      // doubles render as floor(x*1e6 + 0.5) micro-unit longs
      ("d", 3L, 1L, 2L, "1500000", "2250000"),
      // timestamps render as epoch-µs
      ("ts", 3L, 1L, 2L, "1704067200000000", "1704153600000000"),
      // all-NULL column: distinct 0, NULL min/max
      ("z", 3L, 3L, 0L, null, null)))
  }

  test("profile: unknown columns are rejected") {
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Relational.profile(df, Seq("id", "nope"))
    }
  }
}
