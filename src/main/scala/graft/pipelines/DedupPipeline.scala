package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueriesText
import graft.ops.ConnectedComponents

/** The near-dup dedup closure as a PIPELINE: run the expensive part
  * (minhash signatures → LSH band join → connected components) ONCE,
  * materialize the labels table, and serve every downstream consumer —
  * cluster-size histogram (q92's output) and cluster representatives
  * (q93's output) — from that one materialization.
  *
  * Why this exists (VERDICT r04 #3 / SCALE.md "shared closure"): the
  * DECLARED queries q92/q93 are standalone by driver contract (Verify runs
  * each independently), so each rebuilds the closure — ~80% of q93's bench
  * cost is re-running q92's pipeline. A real corpus run never does that:
  * the labels table is the canonical intermediate, written once per corpus
  * snapshot and joined by every consumer. At 100 TB the closure touches
  * every document (shingle + signature scan) while the labels table is
  * paired-docs-sized — materializing it is the difference between one
  * corpus scan and one per consumer.
  *
  * The stage functions below are the SINGLE implementation: q92 and q93
  * call them too (with a fresh closure each, per the standalone contract),
  * so the persisted-labels path and the recompute path cannot drift —
  * `DedupPipelineSpec` additionally asserts their outputs are equal.
  */
object DedupPipeline {

  /** Everything downstream of one closure run. `labels` is the
    * materialized `(v, component)` table both outputs consume.
    */
  final case class DedupOutputs(
      labels: DataFrame,
      histogram: DataFrame,
      representatives: DataFrame)

  /** Stage 1 — the expensive part, run once per corpus snapshot:
    * 3-shingle minhash signatures → banded LSH equi-join → transitive
    * closure. Output `(v, component)`, paired-docs-sized (docs that
    * collide in no band are absent — downstream left-joins keep them).
    */
  def labels(docs: DataFrame): DataFrame =
    ConnectedComponents.labelMinProp(QueriesText.bandPairs(docs))

  /** Stage 2a — cluster-size histogram from a labels table (q92's shape). */
  def sizeHistogram(labels: DataFrame): DataFrame =
    labels.groupBy("component").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
      .orderBy("csize")

  /** Stage 2b — one survivor per cluster from a labels table (q93's
    * shape): longest text wins, doc_id tiebreak; un-paired docs survive
    * as their own cluster via the left join. rn=1 over the
    * cluster-partitioned window plans as WindowGroupLimit → map-side
    * prune (PlanSpec gate on q93).
    */
  def representatives(docs: DataFrame, labels: DataFrame): DataFrame = {
    val labeled = docs
      .join(labels, docs("doc_id") === labels("v"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
    val w = Window.partitionBy("cluster")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    labeled.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id"), col("n_chars"))
      .orderBy("cluster")
  }

  /** The pipeline: one closure, one materialization, every consumer.
    * `localCheckpoint(true)` stands in for the production write of the
    * labels table to durable storage (same cut point in the lineage); on
    * a lossy cluster use `checkpoint()`/a parquet write instead.
    */
  def run(docs: DataFrame): DedupOutputs = {
    val l = labels(docs).localCheckpoint(true)
    DedupOutputs(l, sizeHistogram(l), representatives(docs, l))
  }
}
