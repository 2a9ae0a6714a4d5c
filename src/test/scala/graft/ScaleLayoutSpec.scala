package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Skew, TextStats}

/** Partition-pruned output layout + skew helpers. */
class ScaleLayoutSpec extends SparkSpec {

  test("lang-partitioned output prunes partitions on read") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("bylang").toString
    val stats = TextStats.langId(Tables.load(spark, dir, "documents"))
    stats.write.mode("overwrite").partitionBy("lang_pred").parquet(out)
    val back = spark.read.parquet(out).filter(col("lang_pred") === "en")
    val plan = back.queryExecution.executedPlan.toString
    // partition filter, not a data filter: the scan lists only lang=en dirs
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang_pred"), plan)
    assert(back.count() > 0)
    // pruned read agrees with the unpartitioned filter
    assert(back.count() ==
      stats.filter(col("lang_pred") === "en").count())
  }

  test("salted count-distinct equals direct count-distinct") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // one hot key with many values + long tail
    val rows = (1 to 5000).map(i => ("hot", s"v${rnd.nextInt(2000)}")) ++
      (1 to 500).map(i => (s"k${i % 37}", s"v${rnd.nextInt(50)}"))
    val df = rows.toDF("key", "value")
    val salted = Skew.saltedCountDistinct(df, "key", "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = df.groupBy("key")
      .agg(countDistinct(col("value")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
