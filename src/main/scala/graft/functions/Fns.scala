package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared scalar helpers. All pure `org.apache.spark.sql.functions`
  * compositions — fully codegen'd, no UDFs in the hot path.
  */
object Fns {

  /** Reference 2-dp rounding: `Math.round(x * 100) / 100.0`
    * (reference Code/DocInfo.java:88-91, Code/TF_IDFWorker.java:41).
    * For non-negative x, `Math.round(d)` == `floor(d + 0.5)`, so this is
    * `floor(x*100 + 0.5)/100` — chosen over Spark's `round()` because the
    * floor form is bit-identical across Spark and the DuckDB oracle
    * (both do the same IEEE-754 double ops), while `round()` semantics
    * differ (HALF_UP via BigDecimal vs HALF_EVEN).
    */
  def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** Raw token count of the reference's TF denominator: the length of the
    * single-space split of the TRIMMED text, BEFORE normalization /
    * empty-filtering (reference Code/DocInfo.java:26,89 —
    * `.trim().split(" ")`). The trim matters: Java `split(" ")` (limit 0)
    * drops trailing empty fields, and `trim()` removes the leading ones,
    * so a body like `"before "` (realizable via the literal-'>'
    * truncation quirk) counts 1 word, not 2. After trimming, a limit=-1
    * split has no leading/trailing empties left, so Spark `split` and
    * DuckDB `string_split(trim(text))` agree exactly (empty text → one
    * empty field → count 1, same as Java `"".split(" ")`).
    * Caveat: Java trim strips all control chars <= U+0020; `trim` here is
    * space-only (bodies are single-line, and only spaces create empty
    * split fields).
    */
  def rawTokenCount(text: Column): Column =
    size(split(trim(text), " ", -1)).cast("long")

  /** Reference token normalization: strip non-letters, lowercase
    * (reference Code/Main.java:85, Code/DocInfo.java:33). */
  def normalizeToken(tok: Column): Column =
    lower(regexp_replace(tok, "[^a-zA-Z]", ""))
}
