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

  /** 1e-12-grid quantization by the same floor device as [[round2]] —
    * the cross-engine-safe alternative to CAST(x AS DECIMAL(20,12)):
    * Spark's double→decimal cast expands the binary double EXACTLY
    * before rounding (java BigDecimal) while DuckDB scales in double
    * space, so the two can disagree by one grid ulp on the ~1e-5
    * fraction of values whose scaled form sits at a rounding boundary
    * (observed live: one lr weight in 65 at sf0.1). The floor form is
    * the same IEEE multiply/floor/divide in both engines — bit-exact
    * always. Safe for |x| < ~9e3 (x·1e12 must stay under 2^53). After
    * quantizing, a decimal CAST of the result is unambiguous (the
    * nearest 1e-12 decimal is the grid point itself), so decimal
    * order-free summation composes on top. */
  def quant12(c: Column): Column =
    floor(c * 1000000000000L + lit(0.5)) / 1000000000000L

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
