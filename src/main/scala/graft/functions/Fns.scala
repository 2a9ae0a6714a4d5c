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
    * single-space split BEFORE normalization / empty-filtering
    * (reference Code/DocInfo.java:26,89). Trailing empty fields are kept
    * (limit = -1) so Spark `split` and DuckDB `string_split` agree.
    */
  def rawTokenCount(text: Column): Column =
    size(split(text, " ", -1)).cast("long")

  /** Reference token normalization: strip non-letters, lowercase
    * (reference Code/Main.java:85, Code/DocInfo.java:33). */
  def normalizeToken(tok: Column): Column =
    lower(regexp_replace(tok, "[^a-zA-Z]", ""))
}
