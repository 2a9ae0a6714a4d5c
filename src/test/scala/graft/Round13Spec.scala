package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Round-6 ninth-session batch-4 pins: forward as-of strictness,
  * grouping-sets flags, and bounded-state streaming dedup equivalence.
  */
class Round13Spec extends SparkSpec {

  import spark.implicits._

  // ---- rel_asof_forward: asofJoinForward ----

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoinForward: earliest strictly-later match; equal " +
    "timestamps excluded; backward direction unchanged") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L1"),
      (1L, ts("2024-01-01 12:00:00"), "L2"),
      (2L, ts("2024-01-01 10:00:00"), "L3"))
      .toDF("k", "lt", "ltag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "R10"),
      (1L, ts("2024-01-01 11:00:00"), "R11"),
      (1L, ts("2024-01-01 13:00:00"), "R13"),
      (2L, ts("2024-01-01 09:00:00"), "R09"))
      .toDF("k", "rt", "rtag")
    val fwd = Relational.asofJoinForward(left, right, "k", "k",
        "lt", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // L1 (10:00) must SKIP the equal-time R10 and take R11; L2 takes
    // R13; L3's user has no later right row → drops (inner semantics)
    assert(fwd == Map("L1" -> "R11", "L2" -> "R13"), s"fwd: $fwd")
    val bwd = Relational.asofJoin(left, right, "k", "k", "lt", "rt")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // backward keeps >= semantics: L1 matches the equal-time R10
    assert(bwd == Map("L1" -> "R10", "L2" -> "R11", "L3" -> "R09"),
      s"bwd: $bwd")
  }

  // ---- rel_grouping_sets: orderGroupingSets ----

  test("orderGroupingSets: per-status and per-priority slices plus " +
    "grand total, flagged by grouping()") {
    val orders = Seq(("O", "1-URGENT", 10.0), ("O", "2-HIGH", 20.0),
      ("F", "1-URGENT", 30.0))
      .toDF("o_orderstatus", "o_orderpriority", "o_totalprice")
    val got = Relational.orderGroupingSets(orders).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSet
    assert(got == Set(
      // per-status rows: priority absent (grouping flag 1, NULL value)
      (Some("O"), None, 0L, 1L, 2L, 30.0),
      (Some("F"), None, 0L, 1L, 1L, 30.0),
      // per-priority rows
      (None, Some("1-URGENT"), 1L, 0L, 2L, 40.0),
      (None, Some("2-HIGH"), 1L, 0L, 1L, 20.0),
      // grand total
      (None, None, 1L, 1L, 3L, 60.0)))
  }

  // ---- stream_dedup_bounded: dedupPairsBounded ----

  test("dedupPairsBounded equals batch distinct on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = rows(graft.streaming.EventsStream
      .dedupPairsBounded(spark, dir))
    val expect = rows(graft.Tables.load(spark, dir, "events")
      .select("user_id", "event_type").distinct())
    assert(got == expect)
  }
}
