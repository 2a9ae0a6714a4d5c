package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed shape of a production
  * training-data pipeline, as ONE declarative plan: predict language →
  * floor the quality score → keep only canonical-dedup survivors →
  * deterministic hash sample. Each stage is an operator this engine
  * already exposes; composing them keeps everything in a single
  * Catalyst plan (shared scans, pushed filters) instead of four
  * materialized passes.
  */
object Curate {

  /** Curated corpus slice. `lang` filters on the engine's own
    * [[TextStats.langId]] prediction (self-contained — no trusted lang
    * column required); `minQuality` floors [[TextStats.stats]]'
    * quality_score; dedup survivors are docs that ARE their component's
    * canonical id ([[Dedup.assignCanonical]]); the final
    * [[Sampling.hashSample]] draw is deterministic in (doc_id, salt).
    * Output: (doc_id, lang_pred, n_tokens, quality_score).
    */
  def curate(docs: DataFrame, lang: String = "en",
             minQuality: Double = 0.5, sampleP: Double = 0.5,
             dedupThreshold: Double = 0.8,
             salt: String = "graft"): DataFrame = {
    // stats + langId fused into ONE per-row projection (signals): the
    // two are independent functions of the same text — a join would
    // cost a second scan + shuffle for no information
    val sig = TextStats.signals(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        col("lang_pred"))
    val canon = Dedup.assignCanonical(docs, dedupThreshold)
    val kept = sig.join(canon, "doc_id")
      .filter(col("lang_pred") === lang &&
        col("quality_score") >= minQuality &&
        col("doc_id") === col("canonical_id"))
    Sampling.hashSample(kept, sampleP, "doc_id", salt)
      .select("doc_id", "lang_pred", "n_tokens", "quality_score")
  }
}
