package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
  private def spreadSmallScan(s: SparkSession, df: DataFrame): DataFrame =
    spread(df)

  /** Re-spread a frame whose scan arrived under-partitioned (single
    * staged file, single-row-group parquet) across the cores, so
    * CPU-heavy per-row chains (tokenize, shingle, md5-sketch) do not
    * serialize onto one task — measured r13: each stream_dsir_score
    * micro-batch scored on ONE 3.3 s task before. No-op whenever the
    * input already splits (any real multi-file table at scale). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(target / 2, 2))
      df.repartition(target)
    else df
  }

  /** Normalize the events `ts` column to an instant-typed microsecond
    * TimestampType, whatever physical form the parquet writer chose:
    *
    *  - TIMESTAMP(NANOS): Spark cannot represent it natively; sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong`, the column arrives
    *    as epoch-nanos LongType, and we convert (all downstream
    *    semantics are at second/hour granularity, so the ns→µs
    *    truncation is lossless for every query).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TimestampNTZType, which streaming watermarks and `unix_micros`
    *    reject; the UTC session makes the cast to TimestampType a
    *    lossless wall-clock-preserving relabel — exactly how the
    *    TZ-naive DuckDB oracle reads the same file.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (!df.schema.fieldNames.contains(tsCol)) df
    else df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }
}
