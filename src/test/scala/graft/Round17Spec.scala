package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlText

/** Round-8 pins: the HTML ingestion rules (region priority, boilerplate
  * removal order, entity decode order, the attribute-`>` quirk) and the
  * partitionDiff count-fold.
  */
class Round17Spec extends SparkSpec {

  import spark.implicits._

  private def extractOne(page: String): (String, String, String, String, String) = {
    val r = HtmlText.extract(Seq(page).toDF("value")).collect().head
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.getString(4))
  }

  // --- HtmlText.extract ---

  test("html: full page — metadata extracted, boilerplate dropped, " +
    "entities decoded") {
    val (url, lang, charset, title, text) = extractOne(
      "<html lang=\"en\"><head><meta charset=\"UTF-8\">" +
        "<title>Alpha &amp; Beta</title><script>var x = 1 < 2;</script>" +
        "<link rel=\"canonical\" href=\"https://example.org/a\"></head>" +
        "<body><header>hdr</header><nav>menu</nav><article><p>Body " +
        "&quot;quoted&quot; text.</p></article><footer>ft</footer>" +
        "</body></html>")
    assert((url, lang, charset) ===
      ("https://example.org/a", "en", "utf-8"))
    assert(title === "Alpha & Beta")
    assert(text === "Body \"quoted\" text.")
  }

  test("html: region priority is article > main > body > whole page") {
    assert(extractOne("<html><body><main>M</main>" +
      "<article>A</article></body></html>")._5 === "A")
    assert(extractOne("<html><body><main>M</main>x</body></html>")
      ._5 === "M")
    assert(extractOne("<html><body>B only</body></html>")._5 === "B only")
    assert(extractOne("<p>bare <b>frag</b></p>")._5 === "bare frag")
  }

  test("html: entity decode runs AFTER tag strip and &amp; decodes " +
    "last, so &amp;lt; stays literal and &lt;b&gt; never becomes a tag") {
    val (_, _, _, _, text) = extractOne(
      "<html><body><article>&amp;lt; and &lt;b&gt; and A&nbsp;B" +
        "</article></body></html>")
    assert(text === "&lt; and <b> and A B")
  }

  test("html: attribute-quoted '>' truncates the tag strip (pinned " +
    "single-regex quirk) and a fake </scriptx> does not close a script") {
    assert(extractOne("<html><body><article><div title=\"a>b\">Q</div>" +
      "</article></body></html>")._5 === "b\">Q")
    assert(extractOne("<html><body><script>var s = \"</scriptx>\";" +
      "</script><p>After.</p></body></html>")._5 === "After.")
  }

  test("html: comments strip before blocks; empty page yields empty " +
    "fields") {
    assert(extractOne("<html><body><!-- <script>x</script> -->" +
      "<p>Vis</p></body></html>")._5 === "Vis")
    assert(extractOne("<html></html>") === ("", "", "", "", ""))
  }

  test("html: renderPages→extract round-trips the documents row " +
    "(every boilerplate rule fires)") {
    val docs = Seq((7L, "some doc text", "de"))
      .toDF("doc_id", "text", "lang")
    val got = HtmlText.extract(HtmlText.renderPages(docs))
      .collect().head
    assert(got.toSeq === Seq("https://example.org/p/7", "de", "utf-8",
      "doc 7", "some doc text"))
  }

  // --- partitionDiff count-fold (ADVICE r7) ---

  test("partitionDiff: an even number of added identical-row copies " +
    "is 'changed' via the count fold (xor alone would cancel)") {
    val mk = (rows: Seq[(String, Long)]) => rows
      .toDF("ts0", "event_id")
      .select(col("ts0").cast("timestamp").as("ts"), col("event_id"))
    val oldDf = mk(Seq(("2024-01-01 10:00:00", 1L)))
    // same day, the SAME row now present 3× (xor of the two extra
    // copies cancels: fp equal, count differs)
    val newDf = mk(Seq(("2024-01-01 10:00:00", 1L),
      ("2024-01-01 11:00:00", 1L), ("2024-01-01 12:00:00", 1L)))
    val got = operators.Relational
      .partitionDiff(oldDf, newDf, Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("2024-01-01", "changed")))
  }
}
