package graft.tools

/** Hyperparameter/learnability probe for the linear classifier
  * (BASELINE.md table): accuracy at a few (steps, lr) points on
  * sf0.01 against the lang='en' gate label, plus the same sweep on a
  * SEPARABLE synthetic corpus. Measured finding behind the shipped
  * constants: the driver testdata draws every language's text from
  * ONE shared vocabulary (nb_eval's per-class F1 ≤ 0.23 on non-en
  * classes shows the same), so no lexical model can beat the majority
  * response on lang — the gate pins machinery + bit-exact replay, and
  * the separable sweep (accuracy 1.0 by step 3) pins that training
  * actually learns when signal exists (Round25Spec does the same).
  */
object LrProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("lr-probe", 16)
    import spark.implicits._
    val d = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    for (steps <- Seq(2, 3, 6); lr <- Seq(1.0, 4.0, 16.0)) {
      val r = graft.operators.Classify.lrEval(d, steps = steps, lr = lr)
        .collect().head
      println(s"LRPROBE testdata steps=$steps lr=$lr acc=${r.getAs[Double]("accuracy")} tp=${r.getAs[Long]("tp")} fp=${r.getAs[Long]("fp")}")
      graft.Housekeeping.release(spark)
    }
    val sep = (0L until 400L).map { i =>
      val en = i % 2 == 0
      val text = if (en) "alpha beta gamma delta epsilon " * 8
                 else "uno dos tres cuatro cinco " * 8
      (i, text.trim, if (en) "en" else "es", s"src${i % 4}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    for (steps <- Seq(2, 3, 6); lr <- Seq(1.0, 4.0)) {
      val r = graft.operators.Classify.lrEval(sep, steps = steps, lr = lr)
        .collect().head
      println(s"LRPROBE separable steps=$steps lr=$lr acc=${r.getAs[Double]("accuracy")} tp=${r.getAs[Long]("tp")} fp=${r.getAs[Long]("fp")}")
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
