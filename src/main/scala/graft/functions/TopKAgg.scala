package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (id, score) rows: keeps the k best by
  * (score desc, id asc) in a fixed-size buffer.
  *
  * Versus the window `row_number() <= k` formulation, this PARTIALLY
  * AGGREGATES map-side: each partition ships at most k rows per group
  * key across the shuffle instead of every scored row — the difference
  * between shuffling k·Q rows and N·Q rows on an all-pairs scoring
  * workload. O(k) insert is fine for ranking-sized k.
  * Input: (group-irrelevant id, score); output sorted best-first.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Array[(Double, Long)],
      Array[(Double, Long)]] {

  // java.lang.Double.compare gives a TOTAL order (NaN greatest — the
  // same NaN-ranks-first semantics Spark and DuckDB use in ORDER BY
  // DESC); naive `>` is non-transitive on NaN, which both corrupts the
  // eviction logic and can make sortWith throw
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: Array[(Double, Long)],
                     x: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) buf :+ x
    else {
      var worst = 0
      var i = 1
      while (i < buf.length) {
        if (better(buf(worst), buf(i))) worst = i
        i += 1
      }
      if (better(x, buf(worst))) buf(worst) = x
      buf
    }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)],
                      in: (Long, Double)): Array[(Double, Long)] =
    insert(buf, (in._2, in._1))

  override def merge(a: Array[(Double, Long)],
                     b: Array[(Double, Long)]): Array[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] =
    buf.sortWith(better)

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
