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

  /** Salted inner equi-join for a HOT-KEY probe side against a
    * non-broadcastable build side — the big-big join case AQE's skew
    * split cannot always save (a single join key's rows hash to ONE
    * shuffle partition; splitting helps sort-merge reads but the hot
    * key still lands on one task). Salting re-keys the join on
    * (key, salt): every probe row gets a deterministic salt from its
    * own identity (xxhash64 of `probeSaltCols` — salt-only, never
    * oracle-reproduced), so a hot key's rows spread over `salts`
    * partitions; the build side replicates each row `salts` times to
    * meet them. Exactly the plain join's rows (each probe row meets
    * each matching build row exactly once, in its own salt slot);
    * build-side cost is a bounded `salts`× replication.
    *
    * Inner join only (NULL keys drop on both paths). Column names must
    * be disjoint across the inputs, as in [[Relational.rangeJoin]].
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, probeSaltCols: Seq[String],
                 salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    val overlap = probe.columns.toSet.intersect(build.columns.toSet)
    require(overlap.isEmpty,
      s"saltedJoin inputs share column names: ${overlap.mkString(", ")}")
    val p = probe.withColumn("_ps",
      pmod(xxhash64(probeSaltCols.map(col): _*), lit(salts)))
    val b = build
      .withColumn("_bs0", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_bs", col("_bs0").cast("long")).drop("_bs0")
    p.join(b, p("_ps") === b("_bs") &&
        col(probeKey) === col(buildKey))
      .drop("_ps", "_bs")
  }
}
