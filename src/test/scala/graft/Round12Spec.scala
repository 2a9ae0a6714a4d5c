package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Relational, Sampling, Similarity}

/** Round-6 ninth-session batch-3 pins: k-core peel cascades, the
  * cumulative-users first-seen rewrite, class balancing, and
  * Matryoshka truncation recall.
  */
class Round12Spec extends SparkSpec {

  import spark.implicits._

  // ---- rel_kcore: kCorePeel / purchaseKCore ----

  test("kCorePeel: a path graph cascades one node per round") {
    // path a-b-c-d-e: endpoints have degree 1, peel at k=2 removes one
    // layer per round — round 1 keeps the b-c-d interior, round 2
    // empties it (the true 2-core of a path IS empty; a one-round
    // "remove degree<2 nodes" filter would wrongly report b-c-d as a
    // core) — THIS is the multi-round semantic the converged gate
    // data cannot show
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("key_a", "key_b")
    val r1 = Graph.kCorePeel(path, k = 2, iters = 1)
      .select("node").as[String].collect().toSet
    assert(r1 == Set("b", "c", "d"), s"round 1: $r1")
    val r2 = Graph.kCorePeel(path, k = 2, iters = 2)
    assert(r2.count() == 0, "round 2 must empty the path")
    intercept[IllegalArgumentException] {
      Graph.kCorePeel(path, k = 0)
    }
  }

  test("kCorePeel: a clique survives any number of rounds intact") {
    val clique = (for { a <- 1 to 4; b <- 1 to 4 if a < b }
      yield (s"n$a", s"n$b")).toDF("key_a", "key_b")
    val got = Graph.kCorePeel(clique, k = 3, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("n1" -> 3L, "n2" -> 3L, "n3" -> 3L, "n4" -> 3L))
  }

  // ---- rel_cumulative_users: cumulativeUsers ----

  test("cumulativeUsers: new vs returning users, running distinct") {
    // day0: users 1,2 · day1: users 2,3 · day2: user 1 only
    val events = Seq((0L, 1L), (10L, 2L), (86400L, 2L), (86401L, 3L),
      (172800L, 1L))
      .toDF("sec", "user_id")
      .select(timestamp_seconds(col("sec")).as("ts"), col("user_id"))
    val got = Relational.cumulativeUsers(events).orderBy("day")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      ("1970-01-01", 2L, 2L, 2L),
      ("1970-01-02", 2L, 1L, 3L),
      // a returning-user-only day: 0 new, cumulative unchanged
      ("1970-01-03", 1L, 0L, 3L)))
  }

  // ---- samp_balance: balanceClasses ----

  test("balanceClasses: every stratum capped to the smallest's size") {
    val df = ((1 to 40).map(i => (i.toLong, "en")) ++
      (41 to 50).map(i => (i.toLong, "fr")) ++
      (51 to 70).map(i => (i.toLong, "de")))
      .toDF("doc_id", "lang")
    val got = Sampling.balanceClasses(df).persist()
    val sizes = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("en" -> 10L, "fr" -> 10L, "de" -> 10L))
    // the minority stratum survives whole
    val fr = got.filter(col("lang") === "fr").select("doc_id")
      .as[Long].collect().toSet
    assert(fr == (41L to 50L).toSet)
    // kept set is the deterministic (hash, key) prefix per stratum
    val expectEn = df.filter(col("lang") === "en")
      .orderBy(Sampling.hashValue(col("doc_id"), "graft-bal").asc,
        col("doc_id").asc)
      .limit(10).select("doc_id").as[Long].collect().toSet
    val gotEn = got.filter(col("lang") === "en").select("doc_id")
      .as[Long].collect().toSet
    assert(gotEn == expectEn)
    got.unpersist()
  }

  // ---- sim_trunc_eval: truncationRecall ----

  test("truncationRecall: full-width truncation is recall 1.0; a " +
    "dimension carrying all signal scores by overlap") {
    // 4-dim vectors; queries are vec_id % 50 == 0 → vec 0 and 50
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f), 50L -> Array(0f, 1f, 0f, 0f),
      1L -> Array(0.9f, 0.1f, 0f, 0f), 2L -> Array(0.8f, 0.2f, 0f, 0f),
      3L -> Array(0f, 0.9f, 0.1f, 0f), 4L -> Array(0.1f, 0.9f, 0f, 0f))
      .toDF("vec_id", "embedding")
    // dims = full width ⇒ identical rankings ⇒ recall 1.0 everywhere
    val full = Similarity.truncationRecall(vecs, dims = 4, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(full == Map(0L -> 1.0, 50L -> 1.0))
    // dims=1 keeps only the x-axis: vec 50 and 3 truncate to zero
    // vectors (rank nothing / unrankable) — recall drops, never errors
    val t1 = Similarity.truncationRecall(vecs, dims = 1, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t1.keySet == Set(0L, 50L))
    assert(t1(50L) == 0L, s"zero-truncated query must score 0: $t1")
    assert(t1(0L) >= 1L && t1(0L) <= 3L)
  }
}
