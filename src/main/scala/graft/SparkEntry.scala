package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry;
  * SQL-expressible ones also have a DuckDB `oracleSql` twin over the same
  * parquet tables. Rounding in both sides uses `floor(x*100+0.5)/100`
  * (identical IEEE-754 ops in Spark and DuckDB) so value hashes match
  * bit-for-bit — see graft.functions.Fns.round2.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TfIdfOps.tfIdfPipeline(docs(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- core reference surface (SURVEY.md §2.6 Q1–Q6) ---
    "q1_tokens" -> ((s, dir) => WikiText.tokens(docs(s, dir))),
    "q2_dictionary" -> ((s, dir) => TfIdfOps.dictionary(docs(s, dir))),
    "q3_task1" -> ((s, dir) => TfIdfOps.task1(docs(s, dir))),
    "q4_tf" -> ((s, dir) => TfIdfOps.tf(docs(s, dir))),
    "q5_idf" -> ((s, dir) => {
      val d = docs(s, dir)
      TfIdfOps.idf(TfIdfOps.tf(d), TfIdfOps.corpusSize(d))
    }),
    "q6_tfidf" -> ((s, dir) => TfIdfOps.tfIdfPipeline(docs(s, dir))),
  )

  // Shared DuckDB CTE chain mirroring WikiText.tokens / TfIdfOps over the
  // `documents` parquet table. Kept textually aligned with the Scala ops:
  // any semantic change must land in BOTH places.
  private val tokenCtes: String =
    """toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS raw_len,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), tokens AS (
      |  SELECT doc_id, raw_len, word FROM (
      |    SELECT doc_id, raw_len,
      |           lower(regexp_replace(tok, '[^a-zA-Z]', '', 'g')) AS word
      |    FROM toks)
      |  WHERE length(word) > 0
      |)""".stripMargin

  private val tfCtes: String = tokenCtes +
    """, cnts AS (
      |  SELECT doc_id, word, count(*) AS cnt, max(raw_len) AS raw_len
      |  FROM tokens GROUP BY doc_id, word
      |), tf AS (
      |  SELECT doc_id, word, cnt, tf FROM (
      |    SELECT doc_id, word, cnt,
      |           floor(cnt / raw_len * 100 + 0.5) / 100 AS tf
      |    FROM cnts)
      |  WHERE tf > 0
      |  QUALIFY row_number()
      |    OVER (PARTITION BY doc_id ORDER BY cnt DESC, word ASC) <= 20000
      |)""".stripMargin

  private val idfCtes: String = tfCtes +
    """, dfreq AS (
      |  SELECT word, count(*) AS dfreq FROM tf GROUP BY word
      |), ndocs AS (
      |  SELECT count(*) AS n FROM documents
      |), idf AS (
      |  SELECT word, idf FROM (
      |    SELECT word, floor(log10(n / dfreq) * 100 + 0.5) / 100 AS idf
      |    FROM dfreq, ndocs)
      |  WHERE idf > 0
      |)""".stripMargin

  private val dictCtes: String = tokenCtes +
    """, wcnts AS (
      |  SELECT word, count(*) AS cnt FROM tokens GROUP BY word
      |), dict AS (
      |  SELECT word,
      |         CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) - 1
      |              AS BIGINT) AS "rank",
      |         cnt
      |  FROM (SELECT word, cnt FROM wcnts
      |        ORDER BY cnt DESC, word ASC LIMIT 5000)
      |)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_tokens" ->
      s"WITH $tokenCtes SELECT doc_id, word FROM tokens",
    "q2_dictionary" ->
      s"""WITH $dictCtes SELECT word, "rank", cnt FROM dict""",
    "q3_task1" ->
      s"""WITH $dictCtes
         |SELECT upper(word) AS word, "rank", cnt FROM dict
         |WHERE word IN ('during', 'and', 'time', 'protein', 'car')"""
        .stripMargin,
    "q4_tf" ->
      s"WITH $tfCtes SELECT doc_id, word, cnt, tf FROM tf",
    "q5_idf" ->
      s"WITH $idfCtes SELECT word, idf FROM idf",
    "q6_tfidf" ->
      s"""WITH $idfCtes
         |SELECT t.doc_id, t.word, t.cnt, t.tf,
         |       floor(t.tf * i.idf * 100 + 0.5) / 100 AS tf_idf
         |FROM tf t JOIN idf i USING (word)""".stripMargin,
  )
}
