package graft

import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** Round-9 pins: the persisted-tokenizer artifact (train→write→apply
  * bit-identity with the in-plan encode, artifact layout contract).
  */
class Round18Spec extends SparkSpec {

  import spark.implicits._

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_spec_$tag").toString

  // --- BPE tokenizer artifact ---

  test("bpeArtifactWrite + bpeEncodeFromArtifact: stored-artifact " +
    "encode is identical to the in-plan encode") {
    val docs = Seq(
      (1L, "the theme thesis"),
      (2L, "breathe the loathe"),
      (3L, "north north north the")).toDF("doc_id", "text")
    val dir = scratch("bpetok")
    TextStats.bpeArtifactWrite(docs, dir, rounds = 3)
    val stored = TextStats.bpeEncodeFromArtifact(docs, dir)
    val inplan = TextStats.bpeEncode(docs, rounds = 3)
    assert(rows(stored) === rows(inplan))
    assert(rows(stored).nonEmpty)
  }

  test("bpeArtifactWrite: artifact layout — ordered merge table under " +
    "merges/, trained (w, wf, repr) vocabulary under vocab/") {
    val docs = Seq(
      (1L, "aaab aaab aab"),
      (2L, "ab aaab")).toDF("doc_id", "text")
    val dir = scratch("bpelayout")
    TextStats.bpeArtifactWrite(docs, dir, rounds = 2)
    val merges = spark.read.parquet(s"$dir/merges")
    assert(merges.columns.toSeq === Seq("round", "a", "b", "cnt"))
    // round 1 merges the most frequent pair (a,a); round 2 exists
    assert(merges.orderBy("round").select("round", "a", "b")
      .as[(Long, String, String)].collect().head === ((1L, "a", "a")))
    assert(merges.count() === 2L)
    val vocab = spark.read.parquet(s"$dir/vocab")
    assert(vocab.columns.toSeq === Seq("w", "wf", "repr"))
    // every distinct corpus word is in the stored vocabulary
    assert(rows(vocab.select("w")) === Seq("aaab", "aab", "ab"))
    // reprs are space-joined symbol sequences whose concatenation
    // reconstructs the word (merge rounds never lose characters)
    assert(vocab.select(translate(col("repr"), " ", "") === col("w"))
      .as[Boolean].collect().forall(identity))
  }

  test("bpeEncodeFromArtifact: the merge loop does not re-run on " +
    "encode — encoding a corpus with unseen words keeps trained reprs") {
    val train = Seq((1L, "seen seen words")).toDF("doc_id", "text")
    val dir = scratch("bpeunseen")
    TextStats.bpeArtifactWrite(train, dir, rounds = 2)
    // 'novel' is not in the stored vocabulary: its words drop out of the
    // inner join (the documented in-vocab contract), while 'seen' still
    // encodes through the stored repr
    val apply = Seq((9L, "seen novel")).toDF("doc_id", "text")
    val got = TextStats.bpeEncodeFromArtifact(apply, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(9L))
    assert(got.head._2 === 1L) // only the in-vocab word counted
  }
}
