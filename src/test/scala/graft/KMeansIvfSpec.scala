package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.KMeans

/** IVF recall: k-means-trained cells must retrieve at least as much of the
  * brute-force cosine top-k as the first-k-vectors centroid stand-in they
  * replace (VERDICT r02 #8 done-bar), on the sf0.001 embeddings corpus.
  *
  * Queries are vec_ids 10..59 — deliberately DISJOINT from the stand-in's
  * centroid ids 0..9. When a query is itself a centroid, its cell is by
  * construction the set of vectors with the highest dot against it, i.e.
  * exactly where its cosine top-k lives — recall measured on such queries
  * flatters the stand-in by ~2× (measured 0.59 vs 0.28 on this corpus)
  * and says nothing about queries in general. On centroid-disjoint
  * queries k-means matches-or-beats the stand-in, and multi-probe climbs
  * well above it (the honest recall/cost dial).
  */
class KMeansIvfSpec extends SparkSpec {

  private val K = 10       // cells — matches q54's coarse quantizer size
  private val TOPK = 3
  private val QLO = 10     // query ids [QLO, QHI): disjoint from stand-in
  private val QHI = 60     //   centroids 0..9 (see class doc)

  private lazy val e = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Brute-force cosine top-k ids per query — the ground truth. */
  private def truthFor(corpus: DataFrame): Map[Long, Set[Long]] = {
    val withNrm = corpus
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val q = withNrm.filter(col("vec_id") >= QLO && col("vec_id") < QHI)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    withNrm.join(broadcast(q), lit(true))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TOPK)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getLong(1)).toSet
      }
  }

  private lazy val truth: Map[Long, Set[Long]] = truthFor(e)

  /** IVF search over the query's `nprobe` nearest cells (corpus stays
    * single-cell); returns recall@TOPK against the brute-force truth. */
  private def recallFor(
      corpus: DataFrame, truth: Map[Long, Set[Long]],
      cents: Array[Array[Double]], nprobe: Int): Double = {
    val assigned = KMeans.assignCells(corpus, "vec_id", "embedding", cents)
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val q = KMeans.assignProbes(corpus, "vec_id", "embedding", cents, nprobe)
      .filter(col("vec_id") >= QLO && col("vec_id") < QHI)
      .withColumn("q_nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("q_nrm"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    val got = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TOPK)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getLong(1)).toSet
      }
    val hits = truth.map { case (qid, t) =>
      (got.getOrElse(qid, Set.empty) & t).size
    }.sum
    hits.toDouble / (truth.size * TOPK)
  }

  private def recall(cents: Array[Array[Double]], nprobe: Int = 1): Double =
    recallFor(e, truth, cents, nprobe)

  private def firstKCentroids(df: DataFrame, k: Int = K): Array[Array[Double]] =
    df.filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("k-means centroids are deterministic across re-fits") {
    val c1 = KMeans.fitCentroids(e, col("vec_id"), col("embedding"),
      K, iters = 5, seed = 42L)
    val c2 = KMeans.fitCentroids(e.repartition(9), col("vec_id"),
      col("embedding"), K, iters = 5, seed = 42L)
    assert(c1.length == K && c1.head.length == 64)
    // same seed, same data => same init and same assignment history; the
    // only float nondeterminism is partial-sum merge order, which must not
    // move any vector across a cell boundary on this corpus
    val a1 = KMeans.assignCells(e, "vec_id", "embedding", c1)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val a2 = KMeans.assignCells(e, "vec_id", "embedding", c2)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a1 == a2)
  }

  test("IVF recall with k-means cells >= first-k-vectors stand-in") {
    val standIn = recall(firstKCentroids(e))
    val km = KMeans.fitCentroids(e, col("vec_id"), col("embedding"),
      K, iters = 5, seed = 42L)
    val kmeans = recall(km)
    info(f"recall@$TOPK: stand-in=$standIn%.3f kmeans=$kmeans%.3f")
    assert(kmeans >= standIn,
      f"k-means recall $kmeans%.3f below stand-in $standIn%.3f")
    // multi-probe is the recall/cost dial: more probes, more recall
    val probe2 = recall(km, nprobe = 2)
    info(f"recall@$TOPK nprobe=2: $probe2%.3f")
    assert(probe2 >= kmeans)
  }

  test("k-means STRICTLY beats the stand-in on clustered data " +
    "(gate has teeth — VERDICT r03 #4)") {
    // 8 orthogonal clusters, hash-assigned membership: the first-8-vectors
    // stand-in almost surely duplicates some clusters and misses others,
    // while a real quantizer recovers all centers — on THIS fixture a
    // quantizer that silently degrades to the stand-in FAILS the strict
    // inequality (the sf0.001 corpus test above can only assert >=).
    val clusters = 8
    val cdf = graft.sources.SeededGenerator
      .clusteredEmbeddings(spark, n = 400, seed = 42L, dim = 16,
        clusters = clusters)
      .cache()
    // fixture sanity: the stand-in must actually miss >= 1 cluster, else
    // the fixture can't discriminate (would flag a bad seed choice)
    val standInLabels = cdf.filter(col("vec_id") < clusters)
      .select("label").collect().map(_.getInt(0)).toSet
    assert(standInLabels.size < clusters,
      s"seed gives the stand-in full cluster coverage - fixture toothless")
    val truthC = truthFor(cdf)
    val standIn = recallFor(cdf, truthC, firstKCentroids(cdf, clusters), 1)
    val km = KMeans.fitCentroids(cdf, col("vec_id"), col("embedding"),
      clusters, iters = 5, seed = 42L)
    val r1 = recallFor(cdf, truthC, km, 1)
    info(f"clustered recall@$TOPK: stand-in=$standIn%.3f kmeans=$r1%.3f")
    assert(r1 > standIn,
      f"quantizer does not strictly beat the stand-in ($r1%.3f <= $standIn%.3f)")
    // nprobe monotonicity: each extra probe may only add recall
    val rs = Seq(1, 2, 3, 4).map(p => recallFor(cdf, truthC, km, p))
    info(s"nprobe 1..4 recall: ${rs.map(r => f"$r%.3f").mkString(", ")}")
    assert(rs.sliding(2).forall(w => w(1) >= w(0)),
      s"recall not monotone in nprobe: $rs")
    cdf.unpersist()
  }
}
