package graft

import org.apache.spark.sql.functions._

import graft.ops.{MinHashAggregator, Scalars}

/** Typed Aggregator tier: the MinHash aggregator must agree exactly with
  * the relational min() form used by the declared queries, and behave
  * associatively (partial+final merge).
  */
class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val AB = Seq((2971L, 1129L), (3511L, 2029L))

  test("Aggregator signature equals relational groupBy-min signature") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three"),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // shared token-hash input: (doc_id, tokenHash % P)
    val hashed = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        (Scalars.tokenHash(col("w")) % Scalars.HashP).as("h"))
    // relational form
    val rel = hashed.groupBy("doc_id")
      .agg(
        min((lit(AB(0)._1) * col("h") + lit(AB(0)._2)) % Scalars.HashP).as("h0"),
        min((lit(AB(1)._1) * col("h") + lit(AB(1)._2)) % Scalars.HashP).as("h1"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // typed Aggregator form, forced through partial+final merge by groupByKey
    val agg = new MinHashAggregator(AB)
    val typed = hashed
      .select(col("doc_id").as("_1"), col("h").as("_2"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .collect()
      .map { case (id, sig) => (id, sig(0), sig(1)) }
      .sortBy(_._1)
    assert(rel.toSeq == typed.toSeq)
    // identical docs ⇒ identical signatures
    assert(rel(0)._2 == rel(2)._2 && rel(0)._3 == rel(2)._3)
  }

  test("merge is order-insensitive (associative/commutative)") {
    val agg = new MinHashAggregator(AB)
    val hs = Seq(17L, 5L, 900000001L, 42L)
    val whole = hs.foldLeft(agg.zero.clone())(agg.reduce)
    val (l, r) = hs.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero.clone())(agg.reduce),
      r.reverse.foldLeft(agg.zero.clone())(agg.reduce))
    assert(whole.toSeq == merged.toSeq)
  }
}
