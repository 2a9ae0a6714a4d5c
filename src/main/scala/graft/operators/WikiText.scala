package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fns._

/** Wikiextractor-format parsing (SURVEY.md §1.3): one text line is one
  * document, `<doc id=".." url=".." ...>body</doc`-shaped.
  *
  * Preserves the reference's parsing quirks because they define the
  * computed answers (reference Code/Main.java:83, Code/DocInfo.java:25-26):
  *  - body = text between the FIRST and SECOND '>' — a literal '>' inside
  *    the body truncates it, and the trailing `</doc` (no closing '>')
  *    survives tag-stripping so the last token fuses with "doc"
  *    (e.g. "include</doc" → "includedoc").
  *  - doc_id = substring between `<doc id="` and `" url="`.
  */
object WikiText {

  /** P1+P2: parse raw dump lines (column `value`) → (doc_id, body).
    * The body is trimmed after tag-stripping, exactly like the reference
    * (Code/DocInfo.java:26 `.replaceAll(...).trim()`) — the trim defines
    * the TF denominator via [[graft.functions.Fns.rawTokenCount]]. */
  def parse(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines.select(
      regexp_extract(col(valueCol), "<doc id=\"([^\"]+)\" url=\"", 1)
        .as("doc_id"),
      trim(regexp_replace(get(split(col(valueCol), ">"), lit(1)),
        "<[^>]+>", "")).as("body"))

  /** P3–P5: tokenize + normalize + drop empties.
    * Input: any (idCol, textCol) frame. Output: (doc_id, word) rows.
    * One row per surviving token occurrence (a bag, not a set).
    */
  def tokens(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ", -1)).as("tok"))
      .select(col("doc_id"), normalizeToken(col("tok")).as("word"))
      .filter(length(col("word")) > 0)

  /** Like [[tokens]] but carries the raw (pre-normalization) space-split
    * length of each document — the reference's TF denominator
    * (reference Code/DocInfo.java:26,89).
    * Output: (doc_id, raw_len, word).
    */
  def tokensWithRawLen(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    docs
      // raw_len is projected BELOW the explode on purpose: fused into the
      // same select, Catalyst places the size(split(...)) above Generate,
      // re-splitting the text once per token row (O(tokens × doc_len)).
      .select(col(idCol).as("doc_id"),
        rawTokenCount(col(textCol)).as("raw_len"),
        col(textCol).as("_graft_text"))
      .select(col("doc_id"), col("raw_len"),
        explode(split(col("_graft_text"), " ", -1)).as("tok"))
      .select(col("doc_id"), col("raw_len"),
        normalizeToken(col("tok")).as("word"))
      .filter(length(col("word")) > 0)
}
