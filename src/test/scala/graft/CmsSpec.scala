package graft

import org.apache.spark.sql.functions._

import graft.ops.{CountMin, CountMinAggregator}

/** Count-Min sketch properties that stand in for the missing DuckDB oracle
  * (q106 is no-oracle by design — the sketch hash is Scala-side Murmur3):
  * one-sided error, the ε·N ceiling, partition invariance of the merged
  * sketch, and estimate-vs-exact agreement on the real fixture.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("value")).as[String]

  test("estimate is never below the exact count, and within eps*N") {
    val toks = tokens.cache()
    val n = toks.count()
    val sketch = toks
      .select(new CountMinAggregator().toColumn).head()
    val exact = toks.groupBy("value").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    assert(exact.nonEmpty)
    val eps = math.E / CountMin.Width // classic CM bound, ~0.13%
    exact.foreach { case (tok, c) =>
      val est = CountMin.estimate(sketch, tok)
      assert(est >= c, s"under-count for '$tok': est=$est exact=$c")
      assert(est <= c + math.ceil(eps * n).toLong,
        s"over-count beyond eps*N for '$tok': est=$est exact=$c n=$n")
    }
    toks.unpersist()
    ()
  }

  test("merged sketch is invariant to partitioning (associative merge)") {
    val agg = new CountMinAggregator
    val s1 = tokens.repartition(1).select(agg.toColumn).head()
    val s7 = tokens.repartition(7).select(agg.toColumn).head()
    assert(s1.sameElements(s7))
  }

  test("sketch total mass equals Depth * token count") {
    val toks = tokens
    val n = toks.count()
    val sketch = toks
      .select(new CountMinAggregator().toColumn).head()
    assert(sketch.sum == CountMin.Depth * n)
  }

  test("declared q106 ranks by estimate with exact counts attached") {
    val out = Queries.byName("q106_cms_heavy_hitters")
      .build(spark, sf).collect()
    assert(out.length == 20)
    // estimates dominate exacts and arrive in (est desc, tok asc) order
    out.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    val keys = out.map(r => (-r.getLong(2), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }
}
