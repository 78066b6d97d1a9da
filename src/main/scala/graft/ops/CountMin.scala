package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** Count-Min sketch over a token stream — the mergeable-sketch answer to
  * "approximate per-token frequencies over a corpus too large to hold the
  * exact (token → count) map per executor".
  *
  * Reference behavior: frequency/heavy-hitter style rollups the reference
  * delegates to its warehouse (e.g. volume-by-term aggregations,
  * `rankings_generator.py` term rollups) — here re-expressed as a sketch so
  * the aggregation state is O(depth·width) REGARDLESS of vocabulary size.
  *
  * Scale design (north star = 100 TB):
  *  - The buffer is a flat `Array[Long]` of depth·width counters. `reduce`
  *    is 4 hash-and-increments per token; `merge` is elementwise add —
  *    associative and commutative, so Spark runs it partial+final with
  *    map-side combine like any built-in agg. Executors never exchange
  *    token strings, only fixed-size counter arrays (64 KiB here).
  *  - Estimation (`estimate`) is read-only min-over-rows; the sketch is an
  *    aggregate RESULT (one row), so probing candidates against it is
  *    driver/broadcast-sized work, never a corpus-wide shuffle.
  *  - Guarantees: est ≥ true always (counters only over-count); est ≤
  *    true + ε·N with prob 1−δ for ε = e/width, δ = e^−depth. Width 2048 ⇒
  *    ε ≈ 0.13%; CmsSpec property-tests both bounds plus partition
  *    invariance of the merged sketch.
  *
  * Same `Aggregator` extension tier as [[MinHashAggregator]] (SURVEY.md
  * §2.11): typed input, associative merge, partial-agg friendly.
  */
object CountMin {
  val Depth = 4
  val Width = 2048

  /** Fixed per-row seeds — the sketch is deterministic across runs,
    * partitionings, and engines (MurmurHash3 over the token string).
    */
  private val Seeds = Array(0x9747b28c, 0x85ebca6b, 0xc2b2ae35, 0x27d4eb2f)
  require(Seeds.length == Depth,
    s"CountMin needs one seed per row: ${Seeds.length} seeds for depth $Depth")

  def bucket(tok: String, row: Int): Int =
    (MurmurHash3.stringHash(tok, Seeds(row)) & 0x7fffffff) % Width

  /** Point estimate: min over the Depth counters this token hashes to. */
  def estimate(sketch: Array[Long], tok: String): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = sketch(r * Width + bucket(tok, r))
      if (c < m) m = c
      r += 1
    }
    m
  }
}

/** Typed Count-Min aggregator: fold tokens into a Depth×Width counter
  * array with an elementwise-add merge (partial+final, map-side combine).
  */
class CountMinAggregator
    extends Aggregator[String, Array[Long], Array[Long]] {
  import CountMin._

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var r = 0
    while (r < Depth) {
      buf(r * Width + bucket(tok, r)) += 1L
      r += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
