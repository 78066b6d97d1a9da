package graft

import graft.pipelines.DedupPipeline

/** The shared-closure pipeline (one labels materialization, many
  * consumers) must equal the standalone recompute paths q92/q93 declare —
  * the equality VERDICT r04 #3 asked to be asserted, guarding the
  * SCALE.md claim that persisting labels is a pure cost optimization.
  */
class DedupPipelineSpec extends SparkSpec {

  test("persisted-labels pipeline equals the q92/q93 recompute paths") {
    val docs = Tables.documents(spark, sf)
    val out = DedupPipeline.run(docs)

    val q92 = Queries.byName("q92_dedup_components").build(spark, sf)
    val q93 = Queries.byName("q93_cluster_representatives").build(spark, sf)

    assert(out.histogram.collect().toSeq == q92.collect().toSeq)
    assert(out.representatives.collect().toSeq == q93.collect().toSeq)
  }

  test("labels materialize once: downstream plans read the checkpoint, " +
    "not the closure pipeline") {
    val out = DedupPipeline.run(Tables.documents(spark, sf))
    // a localCheckpoint cuts the lineage: the consumers' logical plans
    // must contain no trace of the upstream band join / minhash stages
    Seq(out.histogram, out.representatives).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("band_key"),
        s"consumer plan re-runs the closure pipeline:\n$plan")
    }
  }
}
