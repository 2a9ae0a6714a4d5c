package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Scale-posture plan invariants, asserted instead of printed (round-8
  * verdict #6 — tools/ExplainAudit is for human review; this FAILS the
  * build): across the headline gate queries the physical plan must
  * never contain
  *  - a CartesianProduct (an accidental unkeyed join is THE 100 TB
  *    scale-killer), or
  *  - a BroadcastNestedLoopJoin whose broadcast side is not the
  *    sanctioned 1-row-aggregate scalar pattern (crossJoin(broadcast(
  *    global agg)) — the in-plan-constant idiom used throughout; any
  *    OTHER BNLJ means a data-sized side is being replicated to every
  *    task),
  * and io_partition_prune's scan must carry real PartitionFilters
  * (losing them silently turns a pruned read into a full-lake scan).
  *
  * Plans are built on a NON-AQE twin session so the static physical
  * plan (what a plan review sees) is asserted directly; AQE only ever
  * replaces these joins with better ones at runtime, never introduces
  * them. Queries whose construction runs driver-side loops or writes
  * (converged gates, artifact builds, io writers, streaming drains)
  * are audited by their own gates/specs instead — building their plans
  * here would re-run those jobs, not add coverage.
  */
class PlanInvariantSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private lazy val audit = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  /** The sanctioned BNLJ: the broadcast side contains a grouping-free
    * aggregate — one physical row by construction. A
    * ReusedExchangeExec is a LEAF wrapper around the exchange it
    * reuses, so it is RESOLVED and its referenced subtree checked for
    * the same scalar pattern — accepting reuse unconditionally would
    * let a reused data-sized broadcast slip past the invariant
    * (ADVICE r9). */
  private def hasScalarAgg(p: SparkPlan): Boolean = {
    var ok = false
    p.foreach {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty =>
        ok = true
      case r: ReusedExchangeExec => if (hasScalarAgg(r.child)) ok = true
      case _ => ()
    }
    ok
  }

  private def isScalarBroadcast(j: BroadcastNestedLoopJoinExec): Boolean =
    hasScalarAgg(j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    })

  private def violations(plan: SparkPlan): Seq[String] =
    plan.collectWithSubqueries {
      case c: CartesianProductExec =>
        Seq(s"CartesianProduct: ${c.simpleStringWithNodeId()}")
      case j: BroadcastNestedLoopJoinExec if !isScalarBroadcast(j) =>
        Seq(s"non-scalar BroadcastNestedLoopJoin: " +
          j.simpleStringWithNodeId())
    }.flatten

  // Join-shape coverage across every operator family whose plan is
  // static (no driver loop / write / stream drain at build time).
  private val Audited: Seq[String] = Seq(
    "q2_dictionary", "q4_tf", "q6_tfidf", "wiki_tfidf",
    "rel_pricing_summary", "rel_revenue_nation", "rel_top_customers",
    "rel_asof_join", "rel_asof_forward", "rel_range_join",
    "rel_interval_join", "rel_skew_join", "rel_fuzzy_join",
    "rel_merge_upsert", "rel_snapshot_diff", "rel_partition_diff",
    "rel_incremental_refresh", "rel_heavy_hitters", "rel_pagerank",
    "rel_components", "rel_kcore", "rel_triangles", "rel_link_predict",
    "rel_bfs_hops", "rel_sssp", "rel_pagerank_weighted", "rel_ppr",
    "rel_funnel", "rel_cohort",
    "rel_activity_spine", "rel_hll_maintain", "rel_k_anonymity",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_embedding", "dedup_decontam", "dedup_decontam_bloom",
    "dedup_url", "dedup_semantic", "dedup_chunks", "dedup_substring",
    "sim_topk_brute", "sim_topk_lsh", "sim_topk_pq",
    "sim_docs_tfidf_pruned", "sim_hard_negatives", "sim_label_eval",
    "samp_hash", "samp_fixed_k", "samp_stratified",
    "samp_token_budget_scalable",
    "samp_split_grouped", "samp_mix_tokens",
    "text_stats", "text_bm25", "text_lm_score_scalable",
    "text_nb_classify", "text_html_extract_scale", "text_token_ids",
    "pipe_entity_res", "pipe_rag_index",
    "io_bucketed_join",
    // round-9 batch-3 additions (artifact gates write their artifacts
    // at plan-build time — sf0.001 scratch writes, cheap and hermetic)
    "rel_attribution", "rel_cms_artifact", "rel_hist_artifact",
    "text_textrank", "sim_knn_graph")

  /** Gates whose BNLJ is the operator's CONTRACT, not an accident:
    * the exhaustive-cosine family broadcasts the sampled (bounded)
    * query set against all candidates over a non-equi condition BY
    * DESIGN — it is the baseline the ANN gates are measured against
    * (Similarity.bruteTopK scaladoc; the scale path is
    * sim_topk_ivf/lsh). Adding a name here requires the same
    * bounded-broadcast justification in the operator's scaladoc. */
  private val SanctionedBnlj: Set[String] =
    Set("sim_topk_brute", "sim_hard_negatives", "sim_label_eval")

  test("headline plans contain no CartesianProduct and no non-scalar " +
    "BroadcastNestedLoopJoin") {
    val bad = Audited.flatMap { name =>
      val plan = SparkEntry.queries(name)(audit, SfDir)
        .queryExecution.executedPlan
      val v = violations(plan).filterNot(msg =>
        SanctionedBnlj.contains(name) &&
          msg.contains("BroadcastNestedLoopJoin"))
      Housekeeping.release(audit)
      v.map(name + ": " + _)
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("io_partition_prune's scan carries real PartitionFilters") {
    val plan = SparkEntry.queries("io_partition_prune")(audit, SfDir)
      .queryExecution.executedPlan
    val scans = plan.collectWithSubqueries {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"no PartitionFilters on any scan:\n$plan")
  }
}
