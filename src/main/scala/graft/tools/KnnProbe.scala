package graft.tools
import org.apache.spark.sql.functions._
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("knnprobe", 32)
    for (k <- Seq(2, 3); sf <- Seq("0.001", "0.01", "0.1")) {
      val emb = graft.Tables.load(spark, s"/root/testdata/sf$sf", "embeddings")
      val out = graft.operators.Similarity.knnComponents(emb, k = k, maxRounds = 40)
      val r = out.agg(max("rounds")).collect()(0).getLong(0)
      println(s"k=$k SF=$sf rounds=$r rows=" + out.count() +
        " comps=" + out.select("component").distinct().count())
    }
    spark.stop()
  }
}
