package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §7.5 #7; builder-prompt scale list).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles sort-merge skew at runtime; explicit salting remains
  * the tool when (a) the skewed side aggregates before joining, or (b) a
  * hot key concentrates in a shuffle-hash join where AQE can't split.
  * The reference's analog is its manual chunking of hot topic pages
  * (`ranking_urls_generator.py:44-47` — 5M-row pages cut into 1000-key
  * chunks).
  */
object Skew {

  /** Two-phase (partial → final) aggregation over a salted key: use when a
    * single group key dominates (e.g. one domain owning most fact rows) so
    * the partial aggregate spreads the hot key over `saltBuckets` reducers.
    * For algebraic aggregates only (sum/count/min/max).
    *
    * The salt is derived from ROW CONTENT (murmur3 over `saltOn`), never
    * from spark_partition_id/monotonically_increasing_id: those are
    * order/partition-dependent, so above a shuffle a partial stage retry
    * could recompute different salts and silently double-count or drop
    * rows (SPARK-23207 class; ADVICE r01). Content-hash salts are stable
    * under any recomputation.
    *
    * `saltOn` must be a NARROW, high-cardinality column subset (e.g. the
    * fact table's row identity, l_orderkey+l_linenumber) — hashing every
    * input column would be just as stable but drags the full row width
    * through the scan, defeating column pruning (ADVICE r02 medium).
    * Rows with identical `saltOn` values share a salt — harmless for
    * algebraic aggregates (the partial/final merge is value-blind).
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBuckets: Int,
      saltOn: Seq[Column]): DataFrame =
    df.select(key.as("k"), value.as("v"),
      pmod(hash(saltOn: _*), lit(saltBuckets)).as("salt"))
      .groupBy("k", "salt")
      .agg(sum("v").as("psum"), count(lit(1)).as("pcnt"))
      .groupBy("k")
      .agg(sum("psum").as("sum_v"), sum("pcnt").as("cnt"))

  /** Salted equi-join of a skewed fact against a small dimension: the dim
    * side is replicated `saltBuckets` times (explode) and the fact side
    * tags each row with a content-derived deterministic salt, so a hot join
    * key fans out over `saltBuckets` tasks instead of one. Salt stability
    * under task retry: same content-hash rationale as [[saltedSumCount]] —
    * join output per row depends only on the row's key, so which replica a
    * row meets never changes the result, and recomputation maps each row to
    * the same bucket. `saltOn` carries the same narrow-subset contract as
    * [[saltedSumCount]] (pruning: the scan must not widen to the full row).
    *
    * Result equals `fact.join(dim, factKey === dimKey)` exactly.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltBuckets: Int,
      saltOn: Seq[Column]): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltOn: _*), lit(saltBuckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(saltedDim,
      saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
