package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table loaders for the testdata layout (one parquet per table). */
object Tables {

  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
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
