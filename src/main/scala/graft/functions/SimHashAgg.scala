package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.Platform

/** One-pass 64-bit SimHash aggregator over (word, count) pairs: bit j of
  * the signature is the sign of Σ(±count), + when bit j of
  * xxh64(bytes(word), seed=42) is set — the same hash family as Spark's
  * xxhash64 expression, so signatures equal the explode-formulation's.
  * Replaces a 64× explode + two extra shuffles with a single
  * ObjectHashAggregate pass.
  */
class SimHashAgg extends Aggregator[(String, String, Long), Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long],
                      in: (String, String, Long)): Array[Long] = {
    val bytes = in._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)
    val cnt = in._3
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) buf(j) += cnt else buf(j) -= cnt
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] =
    ExpressionEncoder[Long]()
}
