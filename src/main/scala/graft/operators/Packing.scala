package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic greedy sequence packing — the step after chunking in a
  * training-data pipeline: concatenate documents into fixed-token-budget
  * bins (training sequences) with minimal padding waste.
  *
  * True greedy packing is a sequential recurrence (each doc's bin
  * depends on the running fill), so it cannot be a window/prefix-sum
  * plan. The distributed shape: md5-shard the corpus (engine-portable,
  * same hash family as [[Sampling]]), then run the greedy fold
  * INDEPENDENTLY per shard in doc_id order — shards are embarrassingly
  * parallel, so at 100 TB the shard count (not the corpus size) sets the
  * parallelism, and every shard's packing is reproducible in isolation
  * (resumable, oracle-replayable). This is the documented legitimate
  * `mapPartitions` case: per-partition imperative state that no
  * declarative operator expresses; everything below it (token count,
  * shard hash) stays codegen'd expressions.
  *
  * Packing rule per shard, docs in doc_id order, budget C:
  *  - n_tokens >= C: the doc closes any open bin and takes a bin alone
  *    (offset 0); oversize docs are NOT truncated — feed them through
  *    [[TextStats.chunk]] first if C must be a hard cap.
  *  - else: if the open bin cannot fit it, open a new one; assign the
  *    doc at the bin's current fill offset.
  *
  * Output: (doc_id, shard, bin, bin_offset, n_tokens) — (shard, bin)
  * identifies the training sequence, bin_offset the doc's token start
  * within it.
  */
object Packing {

  def packGreedy(docs: DataFrame, budget: Long = 256L, shards: Int = 8,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(shards > 0, s"shards must be positive: $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(TextStats.wsTokens(col(textCol))).cast("long").as("n_tokens"),
      (conv(substring(md5(concat(lit("graft-pack|"),
          col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("long") % shards).cast("int").as("shard"))
    // one shuffle keyed by shard; multiple shards may land in one
    // partition — the fold resets its state on every shard change, so
    // the sort key (shard, doc_id) alone defines the packing
    base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var bin = 0L
        var running = 0L
        it.map { case (id, n, sh) =>
          if (sh != curShard) { curShard = sh; bin = 0L; running = 0L }
          if (n >= budget) {
            if (running > 0) { bin += 1; running = 0L }
            val out = (id, sh, bin, 0L, n)
            bin += 1
            out
          } else {
            if (running + n > budget) { bin += 1; running = 0L }
            val out = (id, sh, bin, running, n)
            running += n
            out
          }
        }
      }
      .toDF("doc_id", "shard", "bin", "bin_offset", "n_tokens")
  }
}
