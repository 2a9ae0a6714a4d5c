package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.TfIdfOps

/** Pins our output format against the reference's real golden corpus
  * (`/root/reference/TF-IDF-Docs/`, read-only): 4 `", "`-separated
  * fields, count non-increasing, 2-dp roundings — and checks our Q6 on a
  * synthetic corpus satisfies the same four invariants (SURVEY.md §5). */
class GoldenFormatSpec extends SparkSpec {
  import spark.implicits._

  private val goldenDir = Paths.get("/root/reference/TF-IDF-Docs")

  test("reference golden files: shape assumptions hold (sample)") {
    assume(Files.isDirectory(goldenDir))
    val sample = Files.list(goldenDir).iterator().asScala
      .filter(_.toString.endsWith(".csv")).take(25).toSeq
    assert(sample.nonEmpty)
    sample.foreach { f =>
      val lines = Files.readAllLines(f).asScala.filter(_.nonEmpty)
      val fields = lines.map(_.split(", ", -1))
      assert(fields.forall(_.length == 4), s"$f field count")
      val counts = fields.map(_(1).trim.toLong)
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"$f count ordering")
      // tf and tf_idf parse as doubles with <= 2 decimals
      fields.foreach { r =>
        Seq(r(2), r(3)).foreach { v =>
          val d = v.trim.toDouble
          assert(math.abs(d * 100 - math.round(d * 100)) < 1e-9,
            s"$f not 2dp: $v")
        }
      }
    }
  }

  test("our Q6 output satisfies the golden-corpus invariants") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "data", "join", "scan", "filter", "sort",
      "merge", "group", "the", "fast", "row", "key")
    val docs = (1L to 40L).map { id =>
      val n = 5 + rnd.nextInt(60)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val q6 = TfIdfOps.tfIdfPipeline(docs).collect()
    assert(q6.nonEmpty)
    q6.foreach { r =>
      val tf = r.getDouble(3)
      val tfIdf = r.getDouble(4)
      // 2-dp invariant on every emitted value
      Seq(tf, tfIdf).foreach(d =>
        assert(math.abs(d * 100 - math.round(d * 100)) < 1e-9))
      assert(tf > 0)
    }
    // two-stage rounding invariant, exact: every row's tf_idf equals
    // round2(tf * idf) for the word's single idf value
    val tfT = TfIdfOps.tf(docs)
    val idf = TfIdfOps.idf(tfT, TfIdfOps.corpusSize(docs)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    q6.foreach { r =>
      val expect = math.floor(r.getDouble(3) * idf(r.getString(1)) * 100 +
        0.5) / 100
      assert(r.getDouble(4) == expect, s"two-stage rounding: $r")
    }
  }

  test("SQL users get graft_vec_dot via GraftExtensions-style injection") {
    graft.functions.VecExpressions.register(spark)
    val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    r.createOrReplaceTempView("graft_vec_test")
    val v = spark.sql(
      "SELECT graft_vec_dot(a, b) FROM graft_vec_test").collect()(0)
      .getDouble(0)
    assert(v == 11.0)
  }
}
