package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fns.round2

/** In-plan trained text classification — the quality/language scorer
  * family (CCNet/fastText-style) a training-data pipeline runs over
  * every document before sampling decisions.
  *
  * Training and inference are both plain Catalyst aggregates/joins: the
  * model (per-class word log-likelihoods) is derived from the corpus in
  * the SAME plan that applies it — no driver round-trip, no UDFs. The
  * model tables are bounded artifacts (vocab × classes), so the scoring
  * join broadcasts them; the per-document side stays keyed and
  * data-sized.
  *
  * Numeric determinism (house rules): every `ln` result is `round2`'d
  * the moment it is produced (2-dp doubles are what both engines agree
  * on, the BM25 pattern), per-document contributions sum through
  * DECIMAL(20,8) (order-independent), the prior is added once after the
  * decimal sum, the final score is `round2`'d, and the argmax tie is
  * pinned (score desc, class asc).
  */
object Classify {

  /** Multinomial Naive Bayes over whitespace/alpha tokens with
    * Laplace(1) smoothing, trained on the corpus's own `lang` labels
    * and applied back to every document (self-scoring — the gate
    * shape; at scale the model CTEs train on a labeled slice and score
    * the rest unchanged).
    *
    * score(d, c) = round2( Σ_w cnt(d,w) · round2(ln((cw(c,w)+1) /
    * (tot(c)+V))) + round2(ln(nc(c)/N)) ), prediction = argmax_c with
    * (score desc, lang asc) pinned.
    * Output: (doc_id, pred_lang, score).
    */
  def nbLang(docs: DataFrame): DataFrame = {
    // tokenized corpus feeds 3 aggregates (doc-word, class-word, vocab)
    val toks = WikiText.tokens(docs).persist()
    val docLang = docs.select(col("doc_id"), col("lang"))
    val tokLang = toks.join(docLang, "doc_id")

    // model artifacts — all bounded by vocab × classes, broadcast below
    val classWord = tokLang.groupBy("lang", "word")
      .agg(count(lit(1)).as("cw"))
    val classTot = tokLang.groupBy("lang")
      .agg(count(lit(1)).as("tot"))
    val vocabN = toks.agg(countDistinct("word").as("v"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val priors = docLang.groupBy("lang").agg(count(lit(1)).as("nc"))
      .crossJoin(broadcast(nDocs))
      .select(col("lang"),
        round2(log(col("nc").cast("double") / col("n")))
          .as("prior_ll"))
    val classes = classTot.join(priors, "lang")
      .crossJoin(broadcast(vocabN))

    // data-sized side: per-document term counts
    val docWord = toks.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"))

    // score every (doc, class): unseen class-words smooth to cw=0 via
    // the left join + coalesce (ll = ln(1/(tot+V)))
    val cw = classWord.select(col("lang").as("cw_lang"),
      col("word").as("cw_word"), col("cw"))
    val contribs = docWord
      .crossJoin(broadcast(classes))
      .join(broadcast(cw),
        col("word") === col("cw_word") && col("lang") === col("cw_lang"),
        "left")
      .select(col("doc_id"), col("lang"), col("prior_ll"),
        (col("cnt") *
          round2(log((coalesce(col("cw"), lit(0L)) + 1).cast("double") /
            (col("tot") + col("v"))))).as("contrib"))
    // prior_ll rides in the grouping key (functionally dependent on
    // lang) so the twin's GROUP BY matches shape-for-shape
    val scores = contribs
      .groupBy("doc_id", "lang", "prior_ll")
      .agg(sum(col("contrib").cast("decimal(20,8)")).as("s"))
      .select(col("doc_id"), col("lang"),
        round2(col("s").cast("double") + col("prior_ll")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lang").asc)
    scores.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("score"))
  }

  /** Per-class evaluation report of [[nbLang]] against the true
    * labels — the confusion-summary every shipped classifier carries:
    * per language, support (`n_true`), predicted count (`n_pred`),
    * true positives, precision, recall, F1.
    *
    * F1 uses the exact-integer identity 2·TP / (n_pred + n_true)
    * (= 2TP/(2TP+FP+FN)) — ONE division over exact BIGINTs, no
    * compounding of two already-rounded ratios. Precision is NULL for
    * a class never predicted (0/0), matching SQL semantics in both
    * engines. Classes are language-count-sized, so everything past the
    * doc-level prediction join is a tiny keyed aggregation.
    * Output: (lang, n_true, n_pred, tp, precision, recall, f1).
    */
  def nbEval(docs: DataFrame): DataFrame = {
    val j = nbLang(docs).select(col("doc_id"), col("pred_lang"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .persist() // two consumers: by-true and by-predicted rollups
    val bt = j.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
          .as("tp"))
    val bp = j.groupBy(col("pred_lang").as("cls"))
      .agg(count(lit(1)).as("n_pred"))
    bt.join(bp, Seq("cls"), "left")
      .select(col("cls").as("lang"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"), col("tp"),
        when(coalesce(col("n_pred"), lit(0L)) > 0,
          round2(col("tp") / col("n_pred"))).as("precision"),
        round2(col("tp") / col("n_true")).as("recall"),
        round2((col("tp") * 2) /
          (coalesce(col("n_pred"), lit(0L)) + col("n_true"))).as("f1"))
  }
}
