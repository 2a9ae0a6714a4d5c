package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: measure winnowing density and candidate quality against
  * theory (Schleimer et al. 2003: expected selected fraction of the
  * shingle stream is 2/(w+1) for random hashes).
  * Usage: WinnowProbe [sfDir] */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local("winnow-probe", 32)
    val docs = graft.Tables.load(spark, dir, "documents")
    val t = split(lower(trim(regexp_replace(col("text"),
      "[ \\t\\n\\f\\r]+", " "))), " ")
    val nShingles = docs.select(
        greatest(size(t) - 4, lit(0)).cast("long").as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    val fps = graft.operators.TextStats.winnow(docs)
    val nSel = fps.count()
    val pairs = graft.operators.TextStats.winnowPairsVerified(docs)
      .persist()
    val nPairs = pairs.count()
    val verified = pairs.filter(col("n_common_kgrams") >= 1).count()
    println(f"WINNOW dir=$dir shingles=$nShingles selected=$nSel " +
      f"frac=${nSel.toDouble / nShingles}%.4f theory=${2.0 / 5}%.4f " +
      f"pairs=$nPairs verified=$verified")
    spark.stop()
  }
}
