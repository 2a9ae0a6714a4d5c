package graft.cli

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.{GraftSession, Tables}
import graft.io.CompatIo
import graft.operators._

/** Job-dispatch CLI — the reference's `Main <s3key>` surface
  * (reference Code/Main.java:41-74), generalized: every pipeline the
  * reference runs (task1, task3/tfidf and their intermediate tables)
  * plus the extension jobs, over either wikiextractor text dumps or
  * parquet documents tables, with parameterized input/output paths and
  * no embedded credentials.
  *
  * Usage:
  *   graft.cli.Main <job> --input <path> --output <dir>
  *                  [--format parquet|ref-csv] [--per-doc] [--tables <dir>]
  *
  * Jobs: tokens | dictionary | task1 | tf | idf | tfidf |
  *       dedup-exact | dedup-jaccard | dedup-minhash | dedup-simhash |
  *       text-stats | lang-id | fingerprint |
  *       sim-topk | dedup-embedding   (input: embeddings parquet)
  *
  * `--input` accepts a `.parquet` documents table (doc_id, text) or a
  * text file of `<doc id=..>body</doc>` lines (wikiextractor format).
  */
object Main {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, usage)
    val job = args(0)
    val opts = parseOpts(args.drop(1))
    val spark = GraftSession.local(s"graft-$job",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try run(spark, job, opts)
    finally spark.stop()
  }

  def run(spark: SparkSession, job: String,
          opts: Map[String, String]): Unit = {
    val input = opts.getOrElse("input",
      sys.error("--input required: " + usage))
    val output = opts.getOrElse("output",
      sys.error("--output required: " + usage))
    lazy val docs = readDocs(spark, input)
    lazy val emb = spark.read.parquet(input) // embeddings jobs
    val result: DataFrame = job match {
      case "sim-topk" =>
        Similarity.bruteTopK(
          emb.filter(org.apache.spark.sql.functions.col("vec_id") %
            opts.getOrElse("query-every", "50").toInt === 0), emb,
          k = opts.getOrElse("k", "10").toInt)
      case "dedup-embedding" =>
        Dedup.embeddingNearDup(emb,
          threshold = opts.getOrElse("threshold", "0.5").toDouble)
      case "tokens" => WikiText.tokens(docs)
      case "dictionary" => TfIdfOps.dictionary(docs)
      case "task1" => TfIdfOps.task1(docs)
      case "tf" => TfIdfOps.tf(docs)
      case "idf" =>
        TfIdfOps.idf(TfIdfOps.tf(docs), TfIdfOps.corpusSize(docs))
      case "tfidf" => TfIdfOps.tfIdfPipeline(docs)
      case "dedup-exact" => Dedup.exact(docs)
      case "dedup-jaccard" => Dedup.ngramJaccardPairs(docs)
      case "dedup-minhash" => Dedup.minHashLsh(docs)
      case "dedup-simhash" => Dedup.simHashPairs(docs)
      case "text-stats" => TextStats.stats(docs)
      case "lang-id" => TextStats.langId(docs)
      case "fingerprint" => TextStats.fingerprint(docs)
      case other => sys.error(s"unknown job '$other'. " + usage)
    }
    opts.getOrElse("format", "parquet") match {
      case "ref-csv" =>
        CompatIo.writeRefCsv(result, refCols(job, result), output,
          perDoc = opts.contains("per-doc"))
      case _ =>
        result.write.mode(SaveMode.Overwrite).parquet(output)
    }
  }

  /** Reference column orders for the ref-csv format (FIXTURES.md §A).
    * Per-doc queries carry doc_id: as the partition directory under
    * --per-doc (CompatIo drops it from the row body), as a leading row
    * column otherwise — single-table rows must stay attributable. */
  private def refCols(job: String, df: DataFrame): Seq[String] = job match {
    case "task1" => Seq("word", "rank", "cnt") // task1.csv: WORD, rank, count
    case "dictionary" => Seq("word", "rank", "cnt")
    case "tf" => Seq("doc_id", "word", "cnt", "tf") // docs/<id>.csv rows
    case "idf" => Seq("word", "idf") // idf.csv
    case "tfidf" => Seq("doc_id", "word", "cnt", "tf", "tf_idf")
    case _ => df.columns.toSeq
  }

  /** Parquet documents table or wikiextractor text lines, by extension. */
  def readDocs(spark: SparkSession, input: String): DataFrame =
    if (input.endsWith(".parquet"))
      spark.read.parquet(input)
    else {
      val parsed = WikiText.parse(spark.read.text(input))
      parsed.select(parsed("doc_id"), parsed("body").as("text"))
    }

  private def parseOpts(args: Array[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case flag :: v :: tail if flag.startsWith("--") && !v.startsWith("--") =>
          loop(tail, acc + (flag.drop(2) -> v))
        case flag :: tail if flag.startsWith("--") =>
          loop(tail, acc + (flag.drop(2) -> "true"))
        case other :: _ => sys.error(s"unexpected argument '$other'. " + usage)
      }
    loop(args.toList, Map.empty)
  }

  private val usage =
    "usage: graft.cli.Main <job> --input <path> --output <dir> " +
      "[--format parquet|ref-csv] [--per-doc]"
}
