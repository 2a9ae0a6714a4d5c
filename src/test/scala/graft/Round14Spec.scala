package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Round-7 advice pins: as-of joins must drop NULL-time rows on BOTH
  * sides in BOTH directions (the window ordering would otherwise park
  * them at a partition edge and match them to the key's extreme row),
  * profile() must render large float values exactly (double-widened
  * micro-units), and the rollup/cube/grouping-sets temp views must not
  * leak catalog entries.
  */
class Round14Spec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofImpl: NULL-time rows match nothing and fill nothing, " +
    "both directions") {
    val left = Seq(
      (1L, Option(ts("2024-01-01 12:00:00")), "L_mid"),
      (1L, Option.empty[java.sql.Timestamp], "L_null"))
      .toDF("k", "lt", "ltag")
    val right = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), "R_early"),
      (1L, Option(ts("2024-01-01 13:00:00")), "R_late"),
      (1L, Option.empty[java.sql.Timestamp], "R_null"))
      .toDF("k", "rt", "rtag")
    val fwd = Relational.asofJoinForward(left, right, "k", "k",
        "lt", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // forward scans time-DESC: an unfiltered NULL-time left row would
    // sort FIRST (nulls last in desc ... i.e. Spark puts NULLs last in
    // desc => actually first in scan order here) and frame the whole
    // partition, matching R_early; it must instead drop. R_null must
    // never be a fill source.
    assert(fwd == Map("L_mid" -> "R_late"), s"fwd: $fwd")
    val bwd = Relational.asofJoin(left, right, "k", "k", "lt", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bwd == Map("L_mid" -> "R_early"), s"bwd: $bwd")
  }

  test("profile: float columns render via double-widened micro-units " +
    "(exact above the float 16.0 micro-unit cliff)") {
    // 123.456789f is not representable in float micro-units: FLOAT
    // multiply gives 123456792 (the float closest to 123456789);
    // widening to double first keeps the value the oracle computes.
    val f = 123.456789f
    val df = Seq((1L, f)).toDF("id", "fv")
    val got = Relational.profile(df, Seq("fv")).collect().head
    val expected =
      math.floor(f.toDouble * 1000000 + 0.5).toLong.toString
    assert(got.getAs[String]("min_str") == expected &&
      got.getAs[String]("max_str") == expected,
      s"got $got, want $expected")
    // regression guard: the FLOAT-precision product differs, so a
    // revert to the unwidened multiply fails this test
    assert((f * 1000000 + 0.5f).toLong.toString != expected)
  }

  test("stream-stream left outer: unmatched emission boundary is " +
    "s_ts + 1h < watermark (STRICT); at-or-younger rows never emit") {
    // Terminal watermark W = min(max signup ts, max purchase ts) - 1min.
    // Plant T = 12:00:00 as both sides' max → W = 11:59:00, and three
    // unmatched signups straddling the eviction boundary s_ts+1h vs W:
    //   A: s_ts+1h == W      (10:59:00) → must NOT emit (boundary strict)
    //   B: s_ts+1h == W-1s   (10:58:59) → must emit
    //   C: s_ts+1h == W+1s   (10:59:01) → must NOT emit (still in state)
    // plus a matched pair D and the max-ts anchors themselves.
    def ev(id: Long, t: String, uid: Long, typ: String) =
      (id, ts(t), uid, typ, 1.0, "{}")
    val events = Seq(
      ev(1, "2024-01-01 10:59:00", 101, "signup"),  // A
      ev(2, "2024-01-01 10:58:59", 102, "signup"),  // B
      ev(3, "2024-01-01 10:59:01", 103, "signup"),  // C
      ev(4, "2024-01-01 09:00:00", 104, "signup"),  // D matched
      ev(5, "2024-01-01 09:30:00", 104, "purchase"),
      ev(6, "2024-01-01 12:00:00", 105, "signup"),  // max-ts anchors
      ev(7, "2024-01-01 12:00:00", 106, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files
      .createTempDirectory("sso_fixture").toString
    val stage = java.nio.file.Files
      .createTempDirectory("sso_stage").toString
    events.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.streaming.EventsStream
      .signupToPurchaseOuter(spark, dir, stage)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // only B emits unmatched (strictly below W); D emits matched; A
    // (exactly at W), C, and the 12:00 signup stay in state
    assert(got == Set((2L, -1L), (4L, 5L)), s"got: $got")
  }

  test("intervalJoin: equals the naive overlap join; multi-bucket " +
    "pairs emit once; boundary and empty intervals behave") {
    // bucket = 10 µs. Pairs engineered to cross bucket boundaries and
    // to share SEVERAL buckets (the dedup-free emission must still
    // produce each pair exactly once).
    val left = Seq(
      (1L, 10L, 5L, 35L),   // spans buckets 0..3
      (2L, 10L, 8L, 12L),   // crosses boundary 10
      (3L, 20L, 40L, 41L),  // key mismatch with right row 3
      (4L, 30L, 7L, 7L))    // empty interval: matches nothing
      .toDF("lid", "lk", "ls", "le")
    val right = Seq(
      (10L, 10L, 6L, 34L),  // overlaps 1 across buckets 0..3
      (11L, 10L, 11L, 13L), // overlaps 1 and 2
      (12L, 10L, 35L, 40L), // touches 1's end only: half-open, no match
      (13L, 30L, 40L, 50L), // key 30 ≠ 20
      (14L, 30L, 5L, 9L))   // would overlap 4's [7,7) if it were real
      .toDF("rid", "rk", "rs", "re")
    val got = Relational.intervalJoin(left, right, "lk", "rk",
        "ls", "le", "rs", "re", bucketUs = 10L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right,
        col("lk") === col("rk") && col("ls") < col("re") &&
          col("rs") < col("le") && col("le") > col("ls") &&
          col("re") > col("rs"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"got $got, naive $naive")
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)),
      s"got $got")
    // exactly-once even though (1,10) shares four buckets
    val n = Relational.intervalJoin(left, right, "lk", "rk",
      "ls", "le", "rs", "re", bucketUs = 10L).count()
    assert(n == 4L, s"row count $n")
  }

  test("orderStats: exact rank selection with ties, even/odd groups, " +
    "NULL exclusion") {
    val df = Seq(
      // group "a": n=5 (odd), with a tie on 2.0
      ("a", Option(1.0)), ("a", Option(2.0)), ("a", Option(2.0)),
      ("a", Option(7.0)), ("a", Option(9.0)),
      // group "b": n=4 (even) → med is element at rank (3 div 2)+1 = 2
      ("b", Option(10.0)), ("b", Option(20.0)), ("b", Option(30.0)),
      ("b", Option(40.0)),
      // NULLs must not count toward n or ranks
      ("b", Option.empty[Double]))
      .toDF("g", "v")
    val got = Relational.orderStats(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    // a: ranks 1..5 over (1,2,2,7,9): p25=rank 2 → 2.0, med=rank 3 →
    // 2.0 (the tie), p75=rank 4 → 7.0
    assert(got("a") == ((5L, 1.0, 2.0, 2.0, 7.0, 9.0)), s"a: ${got("a")}")
    // b: n=4 → p25 rank 1, med rank 2, p75 rank 3 (floor convention)
    assert(got("b") == ((4L, 10.0, 10.0, 20.0, 30.0, 40.0)),
      s"""b: ${got("b")}""")
  }

  test("bfsHops: multi-round cascade on a path graph; unreached " +
    "nodes absent") {
    // path 1-2-3-4-5, source {1}: dists 0,1,2,3; node 5 is 4 hops
    // away and must be ABSENT after 3 rounds (the real-data gate is
    // depth-2, so the cascade must be pinned here)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val sources = Seq(1L).toDF("node")
    val got = graft.operators.Graph.bfsHops(sources, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"got $got")
  }

  test("sessionsWithTimeout: strict timeout boundary, cross-batch " +
    "session carry, in-batch gap-break emission") {
    // Anchor (user 999) pins max ts = Jan 25 12:00:00 → terminal
    // watermark W = 11:59:00. Timeout = last + 30 min, fires only
    // STRICTLY below W:
    //   A last 11:29:00 → timeout == W       → must NOT emit
    //   B last 11:28:59 → timeout == W - 1 s → must emit
    //   C last 11:29:01 → timeout == W + 1 s → must NOT emit
    // D has two events > gap apart in one batch: the first session
    // closes in-batch and emits regardless of W; the second stays.
    // E's session SPANS the Jan 11 batch cut (23:55 → 00:10, 900 s
    // apart): state must carry it across the cut as ONE session.
    def ev(id: Long, t: String, uid: Long) =
      (id, ts(t), uid, "view", 1.0, "{}")
    val events = Seq(
      ev(1, "2024-01-25 11:29:00", 101),  // A
      ev(2, "2024-01-25 11:28:59", 102),  // B
      ev(3, "2024-01-25 11:29:01", 103),  // C
      ev(4, "2024-01-25 10:00:00", 104),  // D session 1
      ev(5, "2024-01-25 11:30:01", 104),  // D session 2 (gap 5401 s)
      ev(6, "2024-01-10 23:55:00", 105),  // E part 1 (batch 0)
      ev(7, "2024-01-11 00:10:00", 105),  // E part 2 (batch 1)
      ev(8, "2024-01-25 12:00:00", 999))  // max-ts anchor
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files
      .createTempDirectory("sto_fixture").toString
    val stage = java.nio.file.Files
      .createTempDirectory("sto_stage").toString
    events.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.streaming.EventsStream
      .sessionsWithTimeout(spark, dir, stage)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (102L, "2024-01-25 11:28:59", 1L, 0L),
      (104L, "2024-01-25 10:00:00", 1L, 0L),
      (105L, "2024-01-10 23:55:00", 2L, 900L)), s"got: $got")
  }

  test("rollup/cube/grouping-sets drop their temp views") {
    val orders = Seq(("O", "1-URGENT", 10.0))
      .toDF("o_orderstatus", "o_orderpriority", "o_totalprice")
    // other suites may legitimately hold temp views in the shared
    // session — assert these calls add NONE, not that the catalog is
    // empty
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    Relational.orderCube(orders).collect()
    Relational.orderGroupingSets(orders).collect()
    val after = spark.catalog.listTables().collect().map(_.name).toSet
    assert(after == before, s"leaked views: ${(after -- before).toSeq}")
  }
}
