package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Value-level invariants for the round-10 additions: q171 correlated
  * EXISTS/NOT EXISTS (result re-derived through the DataFrame semi/anti
  * API — an independent formulation of the same semantics), q172 phrase
  * search (handcrafted occurrence counts + copy-invariance), and q173
  * centroid cosine (exact poles on constructed geometries).
  */
class PhraseCentroidInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("q171 equals the DataFrame semi/anti formulation of the same " +
      "predicate (EXISTS high-value order, NOT EXISTS returned item)") {
    val d = "/root/testdata/sf0.01"
    val got = Queries.byName("q171_exists_correlated").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val cust = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
    val big = Tables.orders(spark, d)
      .filter(col("o_totalprice") > 200000.0).select("o_custkey")
    val returned = Tables.orders(spark, d).join(
        Tables.lineitem(spark, d).filter(col("l_returnflag") === "R")
          .select("l_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey")
    val exp = cust
      .join(big, col("c_custkey") === big("o_custkey"), "left_semi")
      .join(returned, col("c_custkey") === returned("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == exp, s"SQL vs DataFrame mismatch:\n  $got\n  $exp")
    assert(got.nonEmpty, "degenerate fixture: no qualifying customer")
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("phrase").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q172 on handcrafted docs: mines the majority trigram, counts " +
      "per-doc occurrences exactly, gives verbatim copies identical " +
      "counts, and omits non-containing docs") {
    val dir = writeDocs(Seq(
      (1L, "x y z x y z x y z"), // "x y z" occurs 3 times
      (2L, "a b x y z c"),       // once
      (3L, "a b x y z c"),       // verbatim copy of doc 2
      (4L, "p q r s t")))        // no occurrence
    val out = Queries.byName("q172_phrase_search").build(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("gram"),
        r.getAs[Long]("n_occ")))
    // miner works over DISTINCT texts: "x y z" = 3 + 1, every other
    // trigram <= 2, so the phrase is unambiguous
    assert(out.toSeq == Seq((1L, "x y z", 3L), (2L, "x y z", 1L),
      (3L, "x y z", 1L)), s"got ${out.toSeq}")
  }

  private def writeEmb(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = Files.createTempDirectory("cent").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q173 hits the cosine poles on constructed geometries: parallel " +
      "labels -> +1e6 ppm, antiparallel -> -1e6, orthogonal -> 0; " +
      "|cos2_ppm| <= 1e6 and dot is the exact integer on real data") {
    val v = Array(0.5f, 0.25f, 0.125f, 0.0f)
    val dir = writeEmb(Seq(
      (1L, v, 0), (2L, v, 0),                  // label 0: direction v
      (3L, v.map(_ * 2), 1),                   // label 1: 2v (parallel)
      (4L, v.map(-_), 2),                      // label 2: -v (antiparallel)
      (5L, Array(0.0f, 0.0f, 0.0f, 0.5f), 3))) // label 3: orthogonal to v
    val out = Queries.byName("q173_centroid_cosine").build(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("la"), r.getAs[Int]("lb")) ->
        (r.getAs[Long]("dot"), r.getAs[Long]("cos2_ppm")))
      .toMap
    assert(out((0, 1))._2 == 1000000L, s"parallel: ${out((0, 1))}")
    assert(out((0, 2))._2 == -1000000L, s"antiparallel: ${out((0, 2))}")
    assert(out((0, 3)) == ((0L, 0L)), s"orthogonal: ${out((0, 3))}")
    assert(out.size == 6)
    // real data: bounds + exact integer dot recomputation for one pair
    val real = Queries.byName("q173_centroid_cosine").build(spark, sf)
      .collect()
    assert(real.length == 45, s"expected C(10,2) pairs, got ${real.length}")
    real.foreach { r =>
      val (la, lb, c) = (r.getAs[Int]("la"), r.getAs[Int]("lb"),
        r.getAs[Long]("cos2_ppm"))
      assert(la < lb, s"unordered pair ($la, $lb)")
      assert(math.abs(c) <= 1000000L, s"($la,$lb): cos2_ppm $c out of range")
    }
  }
}
