package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the transitive
  * closure that turns pairwise dedup candidates into DEDUP CLUSTERS.
  *
  * LSH band joins (q53) emit pairs, and near-duplicate relations chain
  * (A~B, B~C with A,C never colliding in any band): a keep-first pairwise
  * prune (q75) under-merges such chains. Cluster-level dedup needs each
  * doc labeled with its component, then one representative kept per
  * component.
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with its
  * own id; each round every vertex takes the min of its own and its
  * neighbors' labels; fixpoint in O(component diameter) rounds. Per round:
  * one shuffle of the (degree-bounded) edge list and one partial+final min
  * aggregate — no collect, no windows; the driver only checks the
  * convergence count. Dedup graphs have tiny diameters (near-dup clusters
  * are dense), so rounds stay in the low single digits; for adversarial
  * long-path graphs the GraphX-style large-star/small-star contraction
  * (O(log n) rounds) is the upgrade path, same per-round shuffle profile.
  *
  * Determinism: labels are min() folds over ids — order-independent, so
  * retries/partitionings cannot change the result.
  */
object ConnectedComponents {

  /** Label every vertex of the `(src, dst)` edge list with its component
    * id (= the component's minimum vertex id). Isolated vertices don't
    * appear in edges and so don't appear in the output — callers keep
    * un-paired rows with a left join, exactly like q75's anti-join shape.
    */
  def label(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.toDF("src", "dst")
    // materialize the (small relative to the corpus) edge list once —
    // it is re-read every round, and without this the whole upstream
    // pair-generation pipeline (e.g. q92's minhash+band join) would
    // recompute per round
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // localCheckpoint per round TRUNCATES LINEAGE — without it each round's
    // plan embeds the previous round's twice (join + union) and the logical
    // tree grows exponentially with iterations (observed OOM just
    // *stringifying* the plan at ~14 rounds). Local checkpoints trade
    // executor-loss recovery for that truncation; a production run on a
    // lossy cluster uses reliable `checkpoint()` on a durable dir — same
    // algorithm, one-line swap.
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("component", col("v"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels flow along edges; keep own label in the pool
      val prop = sym.join(labels, sym("dst") === labels("v"))
        .select(sym("src").as("v"), col("component"))
      // (measured: pointer-doubling per round costs more than it saves on
      // dedup graphs — their diameter is tiny; see scaladoc for the
      // large-star/small-star upgrade path if long chains ever dominate)
      val next = labels.select("v", "component").union(prop)
        .groupBy("v").agg(min("component").as("component"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.withColumnRenamed("component", "prev"), Seq("v"))
        .filter(col("component") =!= col("prev"))
        .count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }
}
