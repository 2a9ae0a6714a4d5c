package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.Platform

/** One-pass MinHash signature aggregator: for each document, the
  * per-permutation minimum over its shingles of the hash family
  * h_p(s) = xxh64(xxh64(bytes(s), seed=42), seed=p).
  *
  * Replaces the explode(numPerm)×shuffle formulation — the shingle rows
  * never fan out; each input row does one string hash + numPerm cheap
  * long hashes into a fixed Array[Long] buffer (ObjectHashAggregate),
  * cutting the shuffle volume by numPerm×. The LSH candidates it feeds
  * are exact-Jaccard-verified downstream, so any well-mixed hash family
  * yields the identical final pair set.
  */
class MinHashAgg(numPerm: Int)
    extends Aggregator[(Long, String), Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, String)): Array[Long] = {
    val bytes = in._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h0 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42L)
    var p = 0
    while (p < numPerm) {
      val h = XXH64.hashLong(h0, p.toLong)
      if (h < buf(p)) buf(p) = h
      p += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerm) {
      if (b(p) < a(p)) a(p) = b(p)
      p += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
