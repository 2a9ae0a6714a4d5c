package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for 100 TB workloads.
  *
  * Spark's partial aggregation already absorbs skew for algebraic
  * aggregates, and AQE rebalances skewed sort-merge JOIN partitions at
  * runtime. The remaining gap is holistic aggregations over a hot key
  * (collect_list/count_distinct-style state concentrating on one
  * reducer) and broadcast-ineligible joins against a skewed build side —
  * these helpers cover the first case and document the pattern.
  */
object Skew {

  /** Two-stage salted count-distinct substitute: counts distinct `value`
    * per `key` without concentrating one hot key's whole value set on a
    * single reducer. Stage 1 groups by (key, salt(value)) — the hot
    * key's state spreads over `buckets` reducers; stage 2 sums the
    * per-bucket distinct counts (buckets partition the value space, so
    * the counts add exactly).
    */
  def saltedCountDistinct(df: DataFrame, key: String, value: String,
                          buckets: Int = 64): DataFrame =
    df.select(col(key), col(value),
        pmod(xxhash64(col(value)), lit(buckets)).as("_salt"))
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"n_distinct_$value"))
}
