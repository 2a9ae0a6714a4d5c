package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Classify, Dedup, Graph, Relational}

/** Round-6 sixth-session behavior pins: connected-component propagation
  * depth, hand-computed midrank AUC, hand-computed Naive-Bayes scores,
  * incremental-dedup keep/dup semantics, and the bucketed join's
  * no-Exchange plan shape.
  */
class Round7Spec extends SparkSpec {

  import spark.implicits._

  // ---- rel_components: k-step min-label propagation ----
  //
  // Chain graph via 4 orders: c1–s1, c2–s1, c2–s2, c3–s2.
  // Namespaced ids: c1=2, c2=4, c3=6, s1=3, s2=5. Distances from the
  // min node (2): s1=1, c2=2, s2=3, c3=4.

  private def chainGraph: (DataFrame, DataFrame) = {
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    (orders, lineitem)
  }

  test("components: 4 steps converge the 4-hop chain to one label") {
    val (o, l) = chainGraph
    val got = Graph.connectedComponents(o, l, iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("customer", 1L, 2L), ("customer", 2L, 2L),
      ("customer", 3L, 2L), ("supplier", 1L, 2L), ("supplier", 2L, 2L)))
  }

  test("components: 1 step labels exactly the 1-hop neighborhood min") {
    val (o, l) = chainGraph
    val got = Graph.connectedComponents(o, l, iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // c3 (node 6) sees only s2 (5) in one step; c2 (4) reaches s1 (3)
    assert(got == Set(("customer", 1L, 2L), ("customer", 2L, 3L),
      ("customer", 3L, 5L), ("supplier", 1L, 2L), ("supplier", 2L, 4L)))
  }

  test("components: two disjoint components keep distinct labels") {
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val got = Graph.connectedComponents(orders, lineitem, iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // {c1, c2, s1} labeled 2 (min of {2, 4, 3}); {c3, s2} labeled 5
    assert(got == Set(("customer", 1L, 2L), ("customer", 2L, 2L),
      ("supplier", 1L, 2L), ("customer", 3L, 5L), ("supplier", 2L, 5L)))
  }

  // ---- rel_auc: hand-computed midrank AUC ----

  test("auc: separable classes score 1 and 0") {
    val ev = Seq(("a", 0.9), ("a", 0.8), ("b", 0.7), ("b", 0.6))
      .toDF("event_type", "value")
    val got = Relational.aucByType(ev)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got == Map("a" -> 1.0, "b" -> 0.0))
  }

  test("auc: ties take midranks") {
    // asc: 0.4(b)=r1, 0.6(a)=r2, {0.8(a), 0.8(b)} midrank 3.5
    // S(a) = 2 + 3.5 = 5.5, P = N = 2 -> auc = (5.5-3)/4 = 0.625
    val ev = Seq(("a", 0.8), ("b", 0.8), ("a", 0.6), ("b", 0.4))
      .toDF("event_type", "value")
    val got = Relational.aucByType(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(("a", 2L, 2L, 0.625), ("b", 2L, 2L, 0.375)))
  }

  test("auc: single-class input yields NULL, not DIVIDE_BY_ZERO") {
    val ev = Seq(("a", 0.8), ("a", 0.4)).toDF("event_type", "value")
    val rows = Relational.aucByType(ev).collect()
    assert(rows.length == 1 && rows(0).isNullAt(3))
  }

  // ---- text_nb_classify: hand-computed scores ----
  //
  // docs: (1, "aa aa", en), (2, "bb bb", de). V=2, priors ln(1/2).
  //   round2(ln .5) = floor(-69.31+0.5)/100 = -0.69
  //   seen ll  = round2(ln(3/4)) = floor(-28.77+0.5)/100 = -0.29
  //   unseen ll = round2(ln(1/4)) = floor(-138.63+0.5)/100 = -1.39
  //   own-class score   = round2(2·(-0.29) + (-0.69)) = -1.27
  //   cross-class score = round2(2·(-1.39) + (-0.69)) = -3.47

  test("nb: hand-computed class scores and predictions") {
    val docs = Seq((1L, "aa aa", "en"), (2L, "bb bb", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Classify.nbLang(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got == Set((1L, "en", -1.27), (2L, "de", -1.27)))
  }

  test("nb: argmax tie breaks on class name asc") {
    // both classes see the one word equally -> equal scores everywhere,
    // the pinned tie hands every doc the lexicographically first class
    val docs = Seq((1L, "aa", "en"), (2L, "aa", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Classify.nbLang(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "de", 2L -> "de"))
  }

  // ---- dedup_incremental: delta-vs-corpus semantics ----

  test("incremental dedup: corpus dup, in-batch dup, and unique keep") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    val c = "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"
    val docs = Seq(
      (1L, a),   // corpus
      (2L, c),   // corpus, unique
      (5L, a),   // delta: dup of corpus doc 1
      (10L, b),  // delta: batch-canonical of {10, 15}
      (15L, b),  // delta: dup of earlier delta doc 10
      (20L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10") // delta: unique
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalMinHash(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got == Set(
      (5L, 1L, 0L, false),
      (10L, 0L, 0L, true),
      (15L, 0L, 1L, false),
      (20L, 0L, 0L, true)))
  }

  // ---- io_bucketed_join: no Exchange anywhere in the plan ----

  test("bucketed join + same-key agg runs with zero Exchange") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("bkt").toString
    graft.io.CompatIo.writeBucketed(
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey"),
      "graft_test_bkt_orders", "o_orderkey", 4, s"$out/orders")
    graft.io.CompatIo.writeBucketed(
      Tables.load(spark, dir, "lineitem").select("l_orderkey",
        "l_quantity"),
      "graft_test_bkt_lineitem", "l_orderkey", 4, s"$out/lineitem")
    val joined = spark.table("graft_test_bkt_orders").hint("merge")
      .join(spark.table("graft_test_bkt_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"))
    val n = joined.count()
    assert(n > 0)
    // final adaptive plan, after execution: the bucketed layout must
    // carry the join AND the same-key aggregate without any shuffle
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // and the rows are the plain join's rows
    val plain = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n_items"))
    assert(n == plain.count())
  }
}
