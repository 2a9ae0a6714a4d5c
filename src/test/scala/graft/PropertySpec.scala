package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators._

/** ScalaCheck properties for the deterministic-hash family and the
  * quantizer. Pure-JVM properties run as real forAll sweeps; Spark-side
  * properties batch their generated cases into ONE job so the suite
  * stays fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status)
  }

  test("wordBasis == u64 of the md5 hex prefix, for arbitrary unicode") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 0x10FFFF)
        .suchThat(c => !Character.isSurrogate(c.toChar) || c > 0xFFFF))) {
      cps =>
        val s = cps.map(Character.toChars(_).mkString).mkString
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        graft.functions.SimHashAgg.wordBasis(s) ==
          java.lang.Long.parseUnsignedLong(hex.take(16), 16)
    })
  }

  test("thresholdFor: exact endpoints, monotone, in range") {
    assert(Sampling.thresholdFor(0.0) == 0L)
    assert(Sampling.thresholdFor(1.0) == 4294967296L)
    check(Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      (a, b) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        val (tl, th) = (Sampling.thresholdFor(lo), Sampling.thresholdFor(hi))
        tl <= th && tl >= 0L && th <= 4294967296L
    })
  }

  test("quantizeInt8: bounds + error <= scale/2 for random vectors") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 50L).map { i =>
      val dims = 1 + rng.nextInt(16)
      val v = Array.fill(dims)(((rng.nextGaussian()) * 10).toFloat)
      (i, if (i == 49L) Array.fill(4)(0.0f) else v) // one zero vector
    }
    val q = Similarity.quantizeInt8(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getSeq[Any](2))).toMap
    val byId = rows.toMap
    for ((id, (scaleOpt, qs)) <- q) {
      val xs = byId(id)
      scaleOpt match {
        case None => // zero vector: NULL scale, NULL elements
          assert(qs.forall(_ == null), s"vec $id")
        case Some(scale) =>
          xs.zip(qs).foreach { case (x, qv) =>
            val v = qv.asInstanceOf[Int]
            assert(v >= -127 && v <= 127, s"vec $id")
            assert(math.abs(x.toDouble - v * scale) <= scale / 2 + 1e-9,
              s"vec $id: x=$x q=$v scale=$scale")
          }
      }
    }
  }

  test("hashSample: monotone in p for random fraction pairs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .persist()
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val (a, b) = (rng.nextDouble(), rng.nextDouble())
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val small = Sampling.hashSample(docs, lo).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val big = Sampling.hashSample(docs, hi).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(small.subsetOf(big), s"p=$lo not within p=$hi")
    }
    docs.unpersist()
  }

  test("capPerStratum: caps respected, deterministic, subset-stable") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val capped = Sampling.capPerStratum(docs, 3)
    val bySource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(bySource.nonEmpty && bySource.forall(_._2 <= 3))
    // deterministic: same draw every run
    assert(rows(capped) == rows(Sampling.capPerStratum(docs, 3)))
    // cap-3 selection is a prefix of cap-5 per stratum (hash order)
    val ids3 = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids5 = Sampling.capPerStratum(docs, 5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids3.subsetOf(ids5))
  }

  test("mixtureSample: post-sample shares approach targets, none upsampled") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val targets = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)
    val out = Sampling.mixtureSample(docs, targets)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf(targets.keySet)) // others dropped
    val pre = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, n) <- got) assert(n <= pre(l)) // never upsampled
    // the scarcest stratum relative to its target keeps ~everything,
    // and realized shares track targets within sampling noise
    val total = got.values.sum.toDouble
    for ((l, w) <- targets if got.contains(l))
      assert(math.abs(got(l) / total - w) < 0.15,
        s"$l share ${got(l) / total} vs target $w")
  }

  test("splitByHash: random positive weights always label every row") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rng = new scala.util.Random(13)
    val names = Seq("a", "b", "c", "d")
    for (_ <- 1 to 3) {
      val weights = names.map(_ -> (0.05 + rng.nextDouble()))
      val out = Sampling.splitByHash(docs, weights)
      assert(out.count() == docs.count())
      val seen = out.select("split").distinct().collect()
        .map(_.getString(0)).toSet
      assert(seen.subsetOf(names.toSet), seen)
      assert(out.filter(col("split").isNull).count() == 0)
    }
  }
}
