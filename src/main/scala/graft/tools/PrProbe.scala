package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Graph

/** Prints the per-round L∞ rank movement (micro-mass units) of the
  * purchase-graph PageRank at each test SF — the measurement behind
  * rel_pagerank_converged's tolerance choice (the stopping rule must
  * fire INSIDE the unrolled-twin cap at every gate SF, and the
  * rounds-to-tol must stay affordable in both engines). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("pr-probe", 16)
    val maxRounds = if (args.nonEmpty) args(0).toInt else 15
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val st = Graph.prSetup(Tables.load(spark, dir, "orders"),
        Tables.load(spark, dir, "lineitem"))
      var ranks = st.init.localCheckpoint(true)
      val deltas = (1 to maxRounds).map { _ =>
        val next = st.step(ranks).localCheckpoint(true)
        val d = next
          .join(ranks.select(col("node"), col("rank").as("prev")), "node")
          .agg(max(abs(col("rank") - col("prev"))).as("d"))
          .head().getLong(0)
        ranks = next
        d
      }
      println(s"$sf deltas: ${deltas.mkString(", ")}")
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
