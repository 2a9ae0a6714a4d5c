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
    // multiclass learnability (round-13): on testdata the dominant-
    // bucket teacher is a LOW-MARGIN argmax (every class's bucket mass
    // is ~dl/4 ± √dl — the fluctuation IS the label), so few-step GD
    // sits near the majority response; on a class-separable corpus
    // (four disjoint vocabularies whose md5 buckets land in four
    // distinct classes) the same loop must clear 0.95 (Round26Spec
    // pins it)
    def mcAcc(df: org.apache.spark.sql.DataFrame, steps: Int,
              lr: Double): Double = {
      val r = graft.operators.Classify
        .lrMulticlass(df, steps = steps, lr = lr)
        .agg(org.apache.spark.sql.functions.avg(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("y") ===
              org.apache.spark.sql.functions.col("pred"), 1.0)
            .otherwise(0.0)).as("acc"))
        .collect().head.getDouble(0)
      graft.Housekeeping.release(spark)
      r
    }
    for (steps <- Seq(3, 6); lr <- Seq(1.0, 4.0))
      println(s"LRPROBE mc testdata steps=$steps lr=$lr " +
        s"acc=${mcAcc(d, steps, lr)}")
    val vocab = Seq("epsilon zeta mu nu rho",
      "alpha theta iota kappa upsilon", "beta gamma omicron pi tau",
      "delta eta xi phi uno")
    val mcSep = (0L until 400L).map { i =>
      val c = (i % 4).toInt
      (i, (vocab(c) + " ") * 8, "en", s"src${i % 4}", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    for (steps <- Seq(3, 6); lr <- Seq(1.0, 4.0))
      println(s"LRPROBE mc separable steps=$steps lr=$lr " +
        s"acc=${mcAcc(mcSep, steps, lr)}")
    spark.stop()
  }
}
