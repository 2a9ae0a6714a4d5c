package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Graph

/** LPA argmax-implementation probe: times the mode-label round's
  * candidate physical shapes back-to-back in ONE session (same JVM,
  * same load) on the sf0.1 purchase graph, interleaved A/B/A/B so box
  * drift hits both arms equally:
  *  - `struct`   — max(struct(c, -lbl)) per dst (ObjectHashAggregate);
  *  - `packed`   — c·(L+1) + (L−lbl) single-BIGINT max (codegen
  *                 HashAggregate) with L from a broadcast 1-row agg;
  *  - `bcastlbl` — packed + an explicit broadcast() of the label frame
  *                 into the edge join (labels are node-sized, edges
  *                 are the big side — the hint the optimizer can't
  *                 derive for an iteratively-rebuilt frame).
  * Asserts all variants produce identical (node, lbl) rows first.
  */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("lpa-probe", 32)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val edges = Graph.purchaseEdges(Tables.load(spark, dir, "orders"),
      Tables.load(spark, dir, "lineitem")).persist()
    val labels0 = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    println(s"PROBE edges=${edges.count()}")

    def packedRounds(iters: Int): DataFrame = {
      val lMax = labels0.agg(max(col("lbl")).as("lmax"))
      var labels = labels0.persist()
      for (_ <- 1 to iters) {
        val cnt = labels.join(edges, col("node") === col("src"))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        val best = cnt.crossJoin(broadcast(lMax))
          .groupBy("dst")
          .agg(max(col("c") * (col("lmax") + 1) +
            (col("lmax") - col("lbl"))).as("mk"))
          .crossJoin(broadcast(lMax))
          .select(col("dst"),
            (col("lmax") - col("mk") % (col("lmax") + 1)).as("nl"))
        val next = labels.join(best, col("node") === col("dst"), "left")
          .select(col("node"), coalesce(col("nl"), col("lbl")).as("lbl"))
          .persist()
        labels.unpersist()
        labels = next
      }
      labels
    }

    def bcastRounds(iters: Int): DataFrame = {
      val lMax = labels0.agg(max(col("lbl")).as("lmax"))
      var labels = labels0.persist()
      for (_ <- 1 to iters) {
        val cnt = broadcast(labels)
          .join(edges, col("node") === col("src"))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        val best = cnt.crossJoin(broadcast(lMax))
          .groupBy("dst")
          .agg(max(col("c") * (col("lmax") + 1) +
            (col("lmax") - col("lbl"))).as("mk"))
          .crossJoin(broadcast(lMax))
          .select(col("dst"),
            (col("lmax") - col("mk") % (col("lmax") + 1)).as("nl"))
        val next = labels.join(best, col("node") === col("dst"), "left")
          .select(col("node"), coalesce(col("nl"), col("lbl")).as("lbl"))
          .persist()
        labels.unpersist()
        labels = next
      }
      labels
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      graft.Housekeeping.release(spark)
      edges.persist().count()
    }

    // agreement check once
    val a = packedRounds(3).withColumnRenamed("lbl", "l1")
    val b = Graph.labelPropagate(labels0, edges, 3)
      .withColumnRenamed("lbl", "l2")
    val c = bcastRounds(3).withColumnRenamed("lbl", "l3")
    val dis = a.join(b, "node").join(c, "node")
      .filter(col("l1") =!= col("l2") || col("l1") =!= col("l3")).count()
    println(s"PROBE disagreements=$dis")
    require(dis == 0)
    // drop the check's persisted results — a later identical plan
    // would otherwise cache-hit and time ~0 (observed on rep1)
    Seq(a, b, c).foreach(_.unpersist())

    for (rep <- 1 to 3) {
      time(s"struct_rep$rep")(Graph.labelPropagate(labels0, edges, 3).count())
      time(s"packed_rep$rep")(packedRounds(3).count())
      time(s"bcastlbl_rep$rep")(bcastRounds(3).count())
    }
    spark.stop()
  }
}
