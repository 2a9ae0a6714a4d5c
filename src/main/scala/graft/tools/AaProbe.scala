package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Graph

/** Evidence for the Adamic–Adar hub cap: a synthetic co-purchase
  * bipartite graph (50k customers × 10k normal parts, degree ~50) plus
  * ONE celebrity part bought by H customers. The capped operator
  * (maxDeg=200) must stay FLAT as H grows — the hub is pruned before
  * the wedge self-join — while the uncapped form pays H²/2 extra
  * wedges and grows quadratically.
  */
object AaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("aa-probe", 32)
    val nCust = 50000L
    val nParts = 10000L
    val orders = spark.range(nCust)
      .select(col("id").as("o_orderkey"), col("id").as("o_custkey"))
    val normal = spark.range(nCust * 10)
      .select((col("id") % nCust).as("l_orderkey"),
        ((col("id") * 31 + 7) % nParts).as("l_partkey"))
    def run(tag: String, h: Long, maxDeg: Long): Unit = {
      val hub = spark.range(h)
        .select(col("id").as("l_orderkey"), lit(9999999L).as("l_partkey"))
      val li = normal.unionByName(hub)
      val t0 = System.nanoTime()
      val n = Graph.adamicAdar(orders, li, maxDeg = maxDeg, k = 20).count()
      println(f"PROBE aa_$tag h=$h rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      graft.Housekeeping.release(spark)
    }
    for (h <- Seq(2000L, 6000L, 20000L)) run("capped", h, 200L)
    for (h <- Seq(2000L, 6000L)) run("uncapped", h, 1000000000L)
    spark.stop()
  }
}
