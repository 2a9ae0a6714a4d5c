package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Round-6 eighth-session behavior pins: epoch-repeat upsampling
  * (full/fractional/absent arms) and token-budget selection (prefix
  * semantics, exact == scalable).
  */
class Round9Spec extends SparkSpec {

  import spark.implicits._

  // ---- samp_repeat_epochs: repeatEpochs ----

  private def corpus(n: Int) =
    spark.range(1, n + 1).select(col("id").as("doc_id"),
      lit("a").as("lang"))

  test("repeatEpochs: integer factor repeats every row exactly N times") {
    val got = Sampling.repeatEpochs(corpus(20), Map("a" -> 2.0))
    assert(got.count() == 40)
    val epochs = got.groupBy("doc_id").agg(collect_set("epoch"))
      .collect().map(_.getSeq[Long](1).toSet)
    assert(epochs.forall(_ == Set(1L, 2L)))
  }

  test("repeatEpochs: fractional epoch is the hash-chosen subset") {
    val df = corpus(200)
    val got = Sampling.repeatEpochs(df, Map("a" -> 1.5)).persist()
    // every doc has epoch 1; only the hash subset has epoch 2
    assert(got.filter(col("epoch") === 1).count() == 200)
    val extra = got.filter(col("epoch") === 2)
      .select("doc_id").as[Long].collect().toSet
    val expected = df.filter(
        Sampling.hashValue(col("doc_id"), "graft-ep")
          < Sampling.thresholdFor(0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(extra == expected)
    assert(extra.nonEmpty && extra.size < 200)
    got.unpersist()
  }

  test("repeatEpochs: sub-1 factor keeps only the partial-epoch subset") {
    val df = corpus(200)
    val got = Sampling.repeatEpochs(df, Map("a" -> 0.25)).persist()
    assert(got.select(max("epoch")).head().getLong(0) == 1L)
    val n = got.count()
    assert(n > 0 && n < 200)
    got.unpersist()
  }

  test("repeatEpochs: strata without a factor and NULL keys drop") {
    val df = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "a"))
      .toDF("doc_id", "lang")
    val got = Sampling.repeatEpochs(df, Map("a" -> 2.0))
      .select("doc_id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L))
  }

  test("repeatEpochs: rejects factors outside (0, 64]") {
    assertThrows[IllegalArgumentException] {
      Sampling.repeatEpochs(corpus(1), Map("a" -> 0.0))
    }
    assertThrows[IllegalArgumentException] {
      Sampling.repeatEpochs(corpus(1), Map("a" -> 65.0))
    }
  }

  // ---- samp_token_budget: tokenBudgetSelect(+Scalable) ----

  private val budgetDocs = Seq(
    (1L, 10L, 5L), // cum 5
    (2L, 10L, 5L), // cum 10
    (3L, 5L, 10L), // cum 20 -> out
    (4L, 5L, 2L)   // cum 22 -> out (prefix: no backfill past doc 3)
  ).toDF("doc_id", "score", "n_tokens")

  test("tokenBudgetSelect: longest prefix of the quality order, " +
    "no backfill") {
    val got = Sampling.tokenBudgetSelect(budgetDocs, budget = 12L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("tokenBudgetSelect: budget 0 keeps nothing, budget >= total " +
    "keeps all") {
    assert(Sampling.tokenBudgetSelect(budgetDocs, 0L).count() == 0)
    assert(Sampling.tokenBudgetSelect(budgetDocs, 22L).count() == 4)
    assert(Sampling.tokenBudgetSelectScalable(budgetDocs, 0L).count() == 0)
    assert(Sampling.tokenBudgetSelectScalable(budgetDocs, 22L).count() == 4)
  }

  test("tokenBudgetSelectScalable: identical kept set to the exact " +
    "form on a tie-heavy corpus, cutting mid-block") {
    // 7 distinct scores over 210 rows; budget lands inside a tie block
    val df = spark.range(1, 211).select(
      col("id").as("doc_id"),
      (col("id") % 7).as("score"),
      (col("id") * 13 % 50 + 1).as("n_tokens"))
    val total = df.agg(sum("n_tokens")).head().getLong(0)
    for (budget <- Seq(total / 3, total / 2, total - 1)) {
      val exact = Sampling.tokenBudgetSelect(df, budget)
      val scalable = Sampling.tokenBudgetSelectScalable(df, budget)
      assert(rows(exact) == rows(scalable), s"budget=$budget")
    }
  }

  test("tokenBudgetSelectScalable: boundary block fills by key order") {
    // one score block: budget 7 keeps docs 1,2,3 (2+2+2=6; doc 4 would
    // make 8) — the in-block order is the key, not arrival
    val df = Seq((4L, 1L, 2L), (1L, 1L, 2L), (3L, 1L, 2L), (2L, 1L, 2L))
      .toDF("doc_id", "score", "n_tokens")
    val got = Sampling.tokenBudgetSelectScalable(df, 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }
}
