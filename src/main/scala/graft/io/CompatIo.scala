package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Reference-compatible output formats.
  *
  * The reference writes `", "`-delimited (comma+space) CSV rows, ordered
  * count-descending, one file per document (reference Code/DocInfo.java:62,
  * Code/TF_IDFWorker.java:42). Spark's csv `sep` is single-char, so the
  * row is pre-joined with concat_ws and written through the text sink.
  *
  * Per-doc file fan-out explodes into millions of tiny files at 100 TB —
  * the default layout is a single columnar/text table with doc_id as a
  * column; `perDoc = true` opts into the compatibility layout
  * (one directory per doc_id via partitionBy).
  */
object CompatIo {

  val RefDelimiter = ", "

  /** Write `cols` of `df` as reference-style `", "`-joined text rows.
    * Ordering: count-desc, word-asc within each doc (T4 order
    * preservation, tie pinned). Under `perDoc`, doc_id becomes the
    * partition directory and is dropped from the row body. */
  def writeRefCsv(df: DataFrame, cols: Seq[String], outDir: String,
                  perDoc: Boolean = false): Unit = {
    val hasDoc = df.columns.contains("doc_id")
    val hasCnt = df.columns.contains("cnt")
    def body(cs: Seq[String]) =
      concat_ws(RefDelimiter, cs.map(c => col(c).cast("string")): _*)
    if (perDoc && hasDoc) {
      val sorted =
        if (hasCnt)
          df.repartition(col("doc_id"))
            .sortWithinPartitions(col("doc_id"), col("cnt").desc,
              col("word").asc)
        else df.repartition(col("doc_id"))
      sorted
        .select(col("doc_id"), body(cols.filterNot(_ == "doc_id")).as("value"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("doc_id").text(outDir)
    } else {
      // co-locate + order each doc's rows even in the single-table layout
      val sorted =
        if (hasDoc && hasCnt)
          df.repartition(col("doc_id"))
            .sortWithinPartitions(col("doc_id"), col("cnt").desc,
              col("word").asc)
        else if (hasCnt) df.orderBy(col("cnt").desc, col("word").asc)
        else df
      sorted.select(body(cols).as("value"))
        .write.mode(SaveMode.Overwrite).text(outDir)
    }
  }
}
