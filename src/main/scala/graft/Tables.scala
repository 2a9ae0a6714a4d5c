package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table loaders for the testdata layout (one parquet per table). */
object Tables {

  /** Tables whose downstream pipelines are CPU-heavy per row (tokenize,
    * shingle, md5, vector math) — worth spreading across cores even when
    * the input arrives as one split. */
  private val CpuHeavy = Set("documents", "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    val spread =
      if (CpuHeavy(name)) spreadSmallScan(s, df) else df
    if (name == "events") normalizeTs(spread) else spread
  }

  /** The testdata files are single-row-group parquet → Spark scans them
    * as ONE partition, serializing every narrow CPU-heavy stage onto one
    * thread. Re-spread cheap small scans across the cores; on a real
    * multi-split 100 TB input the partition count already exceeds the
    * threshold and this is a no-op.
    */
  private def spreadSmallScan(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(target / 2, 2))
      df.repartition(target)
    else df
  }

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark cannot represent natively. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong`, so the column arrives as
    * epoch-nanos LongType; convert to a microsecond TimestampType here
    * (all downstream semantics are at second/hour granularity, so the
    * ns→µs truncation is lossless for every query).
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (df.schema.fieldNames.contains(tsCol) &&
        df.schema(tsCol).dataType == LongType)
      df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
    else df
}
