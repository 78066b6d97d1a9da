package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator — the `Aggregator[IN, BUF, OUT]`
  * extension tier from SURVEY.md §2.11: fold token hashes into a k-min
  * signature with an associative, commutative merge, so Spark runs it as a
  * partial+final aggregation (map-side combine) like any built-in.
  *
  * Same hash family as the relational form (Scalars.minhashFn /
  * QueriesText.minhashSigs) — MinHashAggSpec asserts the two agree. Use
  * this form when signatures are wanted per `groupByKey` group in typed
  * Dataset code; the relational form remains the declared-query path.
  */
class MinHashAggregator(ab: Seq[(Long, Long)])
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P = Scalars.HashP

  override def zero: Array[Long] = Array.fill(ab.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], tokenHashModP: Long): Array[Long] = {
    var i = 0
    while (i < ab.length) {
      val (a, b) = ab(i)
      val h = (a * tokenHashModP + b) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
