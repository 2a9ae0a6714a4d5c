package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Graph

/** Delta-frontier vs full-set Bellman–Ford cost probe (the BfsProbe
  * pattern applied to the weighted form): on the sf0.1 weighted
  * purchase graph — optionally cloned K× into disjoint shifted-id
  * copies — times [[Graph.ssspBounded]] (relaxes the WHOLE dist table
  * every round) against [[Graph.ssspBoundedDelta]] (relaxes only the
  * nodes whose distance improved last round) across round counts, and
  * prints the per-round improved-set size so the convergence claim is
  * measured, not asserted: once distances settle the delta empties and
  * late rounds cost ~nothing, while the full form keeps paying
  * |dist|⋈|edges| per round. Asserts identical row sets at each depth.
  */
object SsspProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("sssp-probe", 32)
    val k = if (args.nonEmpty) args(0).toInt else 1
    val dir = "/root/testdata/sf0.1"
    val w0 = Graph.purchaseWeightedEdges(
      Tables.load(spark, dir, "orders"),
      Tables.load(spark, dir, "lineitem"))
    val wedges = (0 until k).map(i =>
        w0.select((col("src") + lit(i * 10000000L)).as("src"),
          (col("dst") + lit(i * 10000000L)).as("dst"), col("w")))
      .reduce(_ unionAll _).repartition(32).persist()
    val deg = wedges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val thr = wedges.agg(count(lit(1)).as("ne"))
      .crossJoin(deg.agg(count(lit(1)).as("nn")))
      .select(expr("3 * (ne div nn)").as("t")).head().getLong(0)
    val sources = deg.filter(col("deg") >= thr)
      .select(col("src").as("node")).persist()
    println(s"PROBE k=$k edges=${wedges.count()} " +
      s"sources=${sources.count()}")
    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      graft.Housekeeping.release(spark)
      wedges.persist().count(); sources.persist().count()
      n
    }
    for (rounds <- Seq(2, 4, 8)) {
      val a = time(s"sssp_full_rounds$rounds")(
        Graph.ssspBounded(sources, wedges, rounds).count())
      val b = time(s"sssp_delta_rounds$rounds")(
        Graph.ssspBoundedDelta(sources, wedges, rounds).count())
      assert(a == b, s"row-count mismatch at rounds=$rounds: $a vs $b")
    }
    spark.stop()
  }
}
