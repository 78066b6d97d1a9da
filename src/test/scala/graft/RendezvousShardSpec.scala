package graft

import org.apache.spark.sql.functions._

/** Value-level invariants for q203 (rendezvous shard assignment): the
  * structural elasticity guarantee (growing 8 → 9 shards moves docs ONLY
  * onto the new shard — the argmax over a superset changes only when the
  * new element wins), conservation, determinism, and the contrast with
  * mod-N hashing that is the op's reason to exist.
  */
class RendezvousShardSpec extends SparkSpec {

  private lazy val rows = Queries.byName("q203_rendezvous_shard")
    .build(spark, sf).collect()
    .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val nDocs = Tables.documents(spark, sf).count()

  test("q203 elasticity is one-directional: moved_in = 0 on every old " +
      "shard, the new shard's load IS its moved-in count, and it held " +
      "nothing under 8 shards") {
    rows.filter(_._1 < 8).foreach { case (s, _, _, m) =>
      assert(m == 0L, s"shard $s received moved docs — rendezvous broken")
    }
    val s8 = rows.find(_._1 == 8).get
    assert(s8._2 == 0L, "new shard held docs before it existed")
    assert(s8._3 == s8._4, "new shard's load != its moved-in count")
  }

  test("q203 conservation: both assignments partition the corpus") {
    assert(rows.map(_._2).sum == nDocs)
    assert(rows.map(_._3).sum == nDocs)
  }

  test("q203 movement is ~1/9, not ~8/9: rendezvous moves an order less " +
      "than mod-N rehashing on the same corpus") {
    val moved = rows.map(_._4).sum
    assert(moved > 0L, "no doc moved — suspicious for any real corpus")
    assert(moved * 3 < nDocs,
      s"moved $moved of $nDocs — far above the ~1/9 expectation")
    val modMoved = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(8)) =!= pmod(col("doc_id"), lit(9)))
      .count()
    assert(moved < modMoved,
      s"rendezvous moved $moved, mod-N moved $modMoved — " +
        "no elasticity advantage")
  }

  test("q203 is deterministic: two builds are identical") {
    val again = Queries.byName("q203_rendezvous_shard")
      .build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }
}
