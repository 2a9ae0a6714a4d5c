package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational}

/** Round-6 seventh-session behavior pins: MERGE-apply arm semantics,
  * pinned-values pivot cells, entity-resolution transitivity, and the
  * range-sorted lake layout (plan shape + disjoint per-file ranges).
  */
class Round8Spec extends SparkSpec {

  import spark.implicits._

  // ---- rel_merge_upsert: mergeApply arm semantics ----

  private def mergeFixture = {
    val base = Seq(
      (1L, "a", 10L, 1.0), // updated by delta
      (2L, "a", 20L, 2.0), // deleted by delta
      (3L, "a", 30L, 3.0)  // untouched -> keep
    ).toDF("k1", "k2", "pid", "pv")
    val delta = Seq(
      (1L, "a", 11L, 1.5, "U"), // update
      (2L, "a", 21L, 0.0, "D"), // delete
      (4L, "a", 40L, 4.0, "U")  // insert (no base row)
    ).toDF("k1", "k2", "pid", "pv", "op")
    (base, delta)
  }

  test("mergeApply: update/delete/insert/keep arms") {
    val (base, delta) = mergeFixture
    val got = Relational.mergeApply(base, delta, Seq("k1", "k2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3),
        r.getString(4)))
      .toSet
    assert(got == Set(
      (1L, 11L, 1.5, "update"),
      (3L, 30L, 3.0, "keep"),
      (4L, 40L, 4.0, "insert")))
  }

  test("mergeApply: delete of an absent key is a no-op row") {
    val (base, _) = mergeFixture
    val delta = Seq((9L, "a", 90L, 9.0, "D"))
      .toDF("k1", "k2", "pid", "pv", "op")
    val got = Relational.mergeApply(base, delta, Seq("k1", "k2"))
    // nothing inserted, all base rows keep
    assert(got.count() == 3)
    assert(got.filter(col("action") =!= "keep").count() == 0)
  }

  test("mergeApply: empty delta keeps every base row") {
    val (base, delta) = mergeFixture
    val got = Relational.mergeApply(base, delta.limit(0), Seq("k1", "k2"))
    assert(got.count() == 3)
    assert(got.filter(col("action") =!= "keep").count() == 0)
  }

  test("mergeApply: rejects a delta whose schema is not base + op") {
    val (base, _) = mergeFixture
    val bad = Seq((1L, "a", 1L)).toDF("k1", "k2", "pid")
    assertThrows[IllegalArgumentException] {
      Relational.mergeApply(base, bad, Seq("k1", "k2"))
    }
  }

  // ---- rel_pivot: pinned-values pivot cells ----

  test("pivotEventTypes: counts 0-fill, sums stay NULL on absent cells") {
    val ev = Seq(
      (1L, "click", 1.25),
      (1L, "click", 2.25),
      (1L, "view", 10.0),
      (2L, "view", 5.5)
    ).toDF("user_id", "event_type", "value")
    val got = Relational.pivotEventTypes(ev, Seq("click", "view", "error"))
      .orderBy("user_id").collect()
    assert(got.length == 2)
    val u1 = got(0)
    assert(u1.getLong(0) == 1L)
    assert(u1.getLong(1) == 2L && u1.getDouble(2) == 3.5) // click
    assert(u1.getLong(3) == 1L && u1.getDouble(4) == 10.0) // view
    assert(u1.getLong(5) == 0L && u1.isNullAt(6)) // error: 0 / NULL
    val u2 = got(1)
    assert(u2.getLong(1) == 0L && u2.isNullAt(2)) // click absent
    assert(u2.getLong(3) == 1L && u2.getDouble(4) == 5.5)
  }

  test("pivotEventTypes: types outside the pinned list are dropped") {
    val ev = Seq((1L, "click", 1.0), (1L, "mystery", 99.0))
      .toDF("user_id", "event_type", "value")
    val got = Relational.pivotEventTypes(ev, Seq("click")).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 1L && got(0).getDouble(2) == 1.0)
  }

  // ---- pipe_entity_res: resolveEntities transitivity + rollup ----

  test("resolveEntities: dist-1 chain collapses transitively, " +
    "counts roll up") {
    // aa-ab dist 1, ab-bb dist 1, aa-bb dist 2: one entity via the
    // chain after >= 2 steps; zz is a singleton; 'aa' appears twice
    val df = Seq("aa", "aa", "ab", "bb", "zz").toDF("name")
    val got = Dedup.resolveEntities(df, "name", iters = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("aa", 3L, 4L), ("zz", 1L, 1L)))
  }

  test("resolveEntities: 1 step labels only the 1-hop neighborhood") {
    val df = Seq("aa", "ab", "bb").toDF("name")
    val got = Dedup.resolveEntities(df, "name", iters = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // bb reaches only ab (lbl "ab"... but ab itself relabels to aa in
    // the same step): labels after 1 step are min(seed lbl within
    // distance 1): aa->aa, ab->aa, bb->ab
    assert(got == Set(("aa", 2L, 2L), ("ab", 1L, 1L)))
  }

  test("resolveEntities: normalizes case/whitespace into one key") {
    val df = Seq(" Anne ", "anne", "ANNE").toDF("name")
    val got = Dedup.resolveEntities(df, "name", iters = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("anne", 1L, 3L)))
  }

  // ---- io_sorted_write: range layout (plan + footer ranges) ----

  test("writeSortedRange: RangePartitioning exchange, disjoint " +
    "increasing per-file ranges, identical rows") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    // plan shape: ONE range exchange, no global single-partition sort
    val planned = df.repartitionByRange(4, col("l_orderkey"),
        col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)

    val out = Files.createTempDirectory("sorted").toString
    graft.io.CompatIo.writeSortedRange(df, out, 4,
      Seq("l_orderkey", "l_linenumber"))
    // per-file key ranges, in file-name order, must be non-overlapping
    // and increasing — that is what makes footer min/max stats prune a
    // key-range read to one file
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(parts.length > 1, s"want >1 file, got ${parts.length}")
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: ${ranges.toSeq}")
    }
    // layout must not change the row multiset
    assert(rows(spark.read.parquet(out)) == rows(df))
  }
}
