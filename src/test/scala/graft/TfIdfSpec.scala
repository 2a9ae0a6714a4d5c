package graft

import org.apache.spark.sql.functions.col

import graft.operators._

/** Hand-computed micro-corpus golden test (FIXTURES.md §A6) plus the
  * reference's parsing-quirk fingerprints (SURVEY.md §1.3). */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs, values worked out by hand with two-stage rounding:
  //   doc 1 "the cat sat on the mat"   raw_len 6
  //   doc 2 "the dog! the dog barks"   raw_len 5 (token "dog!" → "dog")
  //   doc 3 "cat and dog and bird"     raw_len 5
  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog! the dog barks"),
    (3L, "cat and dog and bird"),
  ).toDF("doc_id", "text")

  test("Q1 tokens: normalize, lowercase, drop empties") {
    val t = WikiText.tokens(Seq((1L, "Hello, 123 -- WORLD  x")).toDF("doc_id", "text"))
    // "123" and "--" normalize to empty and drop; double space adds an
    // empty raw token (denominator only); "Hello," → "hello".
    assert(rows(t) == Seq("1|hello", "1|world", "1|x"))
  }

  test("Q4 tf: raw-token denominator, 2dp rounding, tf>0") {
    val got = rows(TfIdfOps.tf(corpus))
    val want = Seq(
      // doc 1: the 2/6→0.33, others 1/6→0.17
      "1|the|2|0.33", "1|cat|1|0.17", "1|sat|1|0.17", "1|on|1|0.17",
      "1|mat|1|0.17",
      // doc 2: the 2/5→0.4, dog 2/5→0.4, barks 1/5→0.2
      "2|the|2|0.4", "2|dog|2|0.4", "2|barks|1|0.2",
      // doc 3: and 2/5→0.4, cat/dog/bird 1/5→0.2
      "3|and|2|0.4", "3|cat|1|0.2", "3|dog|1|0.2", "3|bird|1|0.2",
    ).sorted
    assert(got == want)
  }

  test("Q5 idf: round2(log10(N/df)), idf>0") {
    val tfT = TfIdfOps.tf(corpus)
    val got = rows(TfIdfOps.idf(tfT, TfIdfOps.corpusSize(corpus)))
    // df=2 → log10(1.5)=0.176→0.18; df=1 → log10(3)=0.477→0.48
    val want = Seq(
      "the|0.18", "cat|0.18", "dog|0.18",
      "sat|0.48", "on|0.48", "mat|0.48", "barks|0.48", "and|0.48",
      "bird|0.48",
    ).sorted
    assert(got == want)
  }

  test("Q6 tfidf: two-stage rounding") {
    val got = rows(TfIdfOps.tfIdfPipeline(corpus))
      .map(_.split('|').toSeq match {
        case Seq(d, w, c, _, ti) => s"$d|$w|$c|$ti"
      })
    val want = Seq(
      "1|the|2|0.06", "1|cat|1|0.03", "1|sat|1|0.08", "1|on|1|0.08",
      "1|mat|1|0.08",
      "2|the|2|0.07", "2|dog|2|0.07", "2|barks|1|0.1",
      "3|and|2|0.19", "3|cat|1|0.04", "3|dog|1|0.04", "3|bird|1|0.1",
    ).sorted
    assert(got.sorted == want)
  }

  test("Q2 dictionary: rank by count desc, word asc") {
    val d = TfIdfOps.dictionary(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(
      ("the", 0L, 4L), ("dog", 1L, 3L), ("and", 2L, 2L), ("cat", 3L, 2L),
      ("barks", 4L, 1L), ("bird", 5L, 1L), ("mat", 6L, 1L),
      ("on", 7L, 1L), ("sat", 8L, 1L),
    )
    assert(d == want)
  }

  test("Q3 task1: probe + upper") {
    val corpus2 = Seq((1L, "car and protein during time xyz")).toDF("doc_id", "text")
    val got = TfIdfOps.task1(corpus2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.map(_._1) == Set("AND", "CAR", "DURING", "PROTEIN", "TIME"))
    assert(got.forall(_._3 == 1L))
  }

  test("WikiText.parse: doc_id + trailing </doc fusion quirk") {
    val lines = Seq(
      """<doc id="418298" url="https://en.wikipedia.org/wiki?curid=418298" title="X">Some words include</doc>""",
      """<doc id="1" url="u" title="Y">before > after</doc>""",
    ).toDF("value")
    val parsed = WikiText.parse(lines).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(parsed("418298") == "Some words include</doc")
    // literal '>' truncates the body; the trailing space is trimmed
    // exactly like the reference (Code/DocInfo.java:26 `.trim()`), so
    // "before" counts as ONE raw token in the TF denominator, not two
    assert(parsed("1") == "before")
    assert(rows(WikiText.parse(lines)
      .select(col("doc_id"),
        graft.functions.Fns.rawTokenCount(col("body")).cast("string")
          .as("n"))).contains("1|1"))
    // end-to-end: the fused token fingerprint (SURVEY.md §5)
    val toks = rows(WikiText.tokens(WikiText.parse(lines), "doc_id", "body"))
    assert(toks.contains("418298|includedoc"))
  }

  test("tf>0 filter drops rare words in long docs") {
    // 300 raw tokens, one occurrence → 1/300 = 0.0033 → rounds to 0.00
    val longDoc = (Seq.fill(299)("filler") :+ "rare").mkString(" ")
    val t = TfIdfOps.tf(Seq((1L, longDoc)).toDF("doc_id", "text"))
    val m = t.collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(!m.contains("rare"))
    assert(m("filler") == 1.0) // 299/300 = 0.9966 → 1.00
  }
}
