package graft

import org.apache.spark.sql.functions._

import graft.io.CompatIo
import graft.operators.{Dedup, Relational, TextStats}

/** Round-6 ninth-session batch-2 pins: compaction quota-binning,
  * rate-anomaly z-scores (injected spike), token drift (hand-computed
  * KL terms), and chunk-level dup profiling.
  */
class Round11Spec extends SparkSpec {

  import spark.implicits._

  // ---- io_compaction_plan: compactionPlan ----

  test("compactionPlan: quota bins from the exclusive prefix sum") {
    val files = Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 250L))
      .toDF("file_id", "bytes")
    val got = CompatIo.compactionPlan(files, targetBytes = 300L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // excl sums 0/100/300/600 → bins 0/0/1/2
    assert(got == Set((1L, 100L, 0L, 2L, 300L), (2L, 200L, 0L, 2L, 300L),
      (3L, 300L, 1L, 1L, 300L), (4L, 250L, 2L, 1L, 250L)))
    intercept[IllegalArgumentException] {
      CompatIo.compactionPlan(files, targetBytes = 0L)
    }
  }

  test("compactionPlan: non-final bin totals stay within one file of " +
    "the target") {
    val target = 1000L
    val files = spark.range(1, 200).select(col("id").as("file_id"),
      (col("id") * 37 % 400 + 50).as("bytes"))
    val maxBytes = 450L
    val plan = CompatIo.compactionPlan(files, target).persist()
    assert(plan.count() == 199)
    val lastBin = plan.agg(max("bin")).head().getLong(0)
    val bins = plan.select("bin", "bin_bytes").distinct()
      .filter(col("bin") < lastBin)
      .select("bin_bytes").as[Long].collect()
    assert(bins.forall(b => b > target - maxBytes && b < target + maxBytes),
      s"bin totals out of quota band: ${bins.sorted.toSeq}")
    plan.unpersist()
  }

  // ---- rel_rate_anomaly: rateAnomaly ----

  private def hourlyEvents(perHour: Seq[Int], typ: String = "view") = {
    val rows = perHour.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => (h * 3600L + i, typ))
    }
    rows.toDF("sec", "event_type")
      .select(timestamp_seconds(col("sec")).as("ts"), col("event_type"))
  }

  test("rateAnomaly: an injected spike flags; jittered baseline does not") {
    // 30 alternating 9/11 hours, then a 100-event spike
    val counts = (0 until 30).map(h => if (h % 2 == 0) 9 else 11) :+ 100
    val got = Relational.rateAnomaly(hourlyEvents(counts))
      .orderBy("hour").collect()
    val spike = got.last
    assert(spike.getLong(2) == 100 && spike.getBoolean(5),
      s"spike row not flagged: $spike")
    // mean 10, var 576/552 over the full 24h alternating window
    val expZ = {
      val z = (100.0 - 240.0 / 24) /
        math.sqrt((24.0 * 2424 - 240.0 * 240) / (24 * 23))
      math.floor(z * 100 + 0.5) / 100
    }
    assert(spike.getDouble(4) == expZ)
    // no non-spike hour flags; early hours (< 8h of history) are NULL z
    assert(got.init.forall(r => !r.getBoolean(5)))
    assert(got.take(8).forall(_.isNullAt(4)))
    assert(got.init.drop(8).forall(r => math.abs(r.getDouble(4)) < 3))
  }

  test("rateAnomaly: zero-variance baseline yields NULL z, no flag") {
    val got = Relational.rateAnomaly(hourlyEvents(Seq.fill(20)(5) :+ 50))
      .orderBy("hour").collect()
    assert(got.forall(_.isNullAt(4)))
    assert(got.forall(r => !r.getBoolean(5)))
  }

  // ---- text_drift: tokenDrift ----

  test("tokenDrift: hand-computed smoothed KL terms") {
    val docs = Seq((0L, "a a b"), (1L, "a b b"), (2L, "b c"))
      .toDF("doc_id", "text")
    val rows = TextStats.tokenDrift(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // np=3 nq=5 v=3: p=(c_p+1)/6, q=(c_q+1)/8
    def expected(cp: Long, cq: Long) = {
      val p = (cp + 1).toDouble / 6
      val q = (cq + 1).toDouble / 8
      val lnr = math.floor(math.log(p / q) * 100 + 0.5) / 100
      (cp, cq, lnr, p * lnr)
    }
    assert(rows("a") == expected(2, 1))
    assert(rows("b") == expected(1, 3))
    assert(rows("c") == expected(0, 1))
  }

  test("tokenDrift: identical split distributions give zero drift") {
    val docs = Seq((0L, "a b c"), (1L, "a b c"), (20L, "a b c"),
      (21L, "a b c")).toDF("doc_id", "text")
    val got = TextStats.tokenDrift(docs)
    assert(got.filter(col("log_ratio") =!= 0.0).count() == 0)
    assert(got.filter(col("kl_term") =!= 0.0).count() == 0)
  }

  // ---- dedup_chunks: chunkDupStats ----

  test("chunkDupStats: clones fully duplicated, unique doc untouched") {
    val clone = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, clone), (2L, clone),
      (3L, (1 to 40).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L)._2 == got(1L)._1 && got(1L)._3 == 1.0,
      s"clone 1 not fully dup: ${got(1L)}")
    assert(got(2L)._2 == got(2L)._1 && got(2L)._3 == 1.0)
    assert(got(3L)._2 == 0L && got(3L)._3 == 0.0)
    // chunk counts agree with cdcChunk itself
    val nc = TextStats.cdcChunk(docs).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap == nc)
  }
}
