package graft

import graft.ops.ConnectedComponents

/** Min-label propagation must produce the true transitive closure —
  * chains, stars, multiple components, and long paths (many rounds).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.label(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains merge transitively across bands") {
    // 1-2, 2-3 chain plus separate 10-11: two components
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long path converges (diameter > a few rounds)") {
    val path = (1L to 15L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = components(path)
    assert(got.values.toSet == Set(1L) && got.size == 15)
  }

  test("edge direction and duplicates don't matter") {
    val got = components(Seq((5L, 2L), (2L, 5L), (2L, 9L), (9L, 2L), (5L, 2L)))
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }
}
