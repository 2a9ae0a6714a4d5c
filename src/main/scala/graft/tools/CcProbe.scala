package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Graph

/** Measures rounds-to-fixpoint of min-label components and k-core
  * peeling on the purchase graph at each test SF — the measurement
  * behind the converged-gate caps (the unrolled twin must cover the
  * real fixpoint at every gate SF). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("cc-probe", 16)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val orders = Tables.load(spark, dir, "orders")
      val lineitem = Tables.load(spark, dir, "lineitem")
      val edges = Graph.purchaseEdges(orders, lineitem)
      val labels0 = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      val (lbl, ccRounds) = Graph.minLabelFixpoint(labels0, edges, 60)
      val nComp = lbl.select(countDistinct(col("lbl"))).head().getLong(0)
      val e0 = orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("key_a"),
          (col("l_suppkey") * 2 + 1).as("key_b"))
        .distinct()
      val kVal = e0.agg(count(lit(1)).as("ne"))
        .crossJoin(e0.select(col("key_a").as("n"))
          .unionAll(e0.select(col("key_b").as("n")))
          .agg(countDistinct(col("n")).as("nn")))
        .select(expr("ne div nn").as("k")).head().getLong(0)
      val (core, kcRounds) = Graph.kCoreFixpoint(e0, kVal.toInt, 100)
      println(s"PROBE $sf cc_rounds=$ccRounds components=$nComp " +
        s"kcore_k=$kVal kcore_rounds=$kcRounds core=${core.count()}")
      graft.Housekeeping.release(spark)
    }
    spark.stop()
  }
}
