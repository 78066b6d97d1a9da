package graft

import org.apache.spark.sql.functions._

import graft.ops.ProductQuantizer
import graft.sources.SeededGenerator

/** Product quantization: the ADC identity (testable to machine epsilon),
  * code determinism under partitioning, the 32× compression claim, and a
  * recall gate on the clustered fixture (oracle stand-in — PQ is
  * no-oracle: DuckDB cannot replay a Lloyd fit).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private lazy val fixture = SeededGenerator
    .clusteredEmbeddings(spark, n = 400, seed = 42L, dim = Dim,
      clusters = 8, noise = 0.05)
    .cache()

  private lazy val model = ProductQuantizer.fit(fixture,
    col("vec_id"), col("embedding"), dim = Dim, m = 4, k = 16,
    iters = 5, seed = 7L)

  test("ADC distance equals exact distance to the decoded vector") {
    // squared L2 sums over disjoint subspaces, so the table-lookup sum
    // must EQUAL ||q - decode(code)||^2 — not approximately, exactly.
    val rows = fixture.limit(5).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val codes = ProductQuantizer.encode(fixture,
      col("vec_id"), col("embedding"), model)
      .filter(col("vec_id") < 5)
      .as[(Long, Array[Byte])].collect().toMap
    val q = rows.head._2
    rows.foreach { case (vid, _) =>
      val code = codes(vid)
      val dec = model.decode(code)
      val exact = q.indices.map(i => {
        val d = q(i) - dec(i); d * d
      }).sum
      val adc = ProductQuantizer
        .adcTopK(
          Seq((vid, code)).toDF("vec_id", "code"), model,
          Seq((-1L, q)), topK = 1)
        .collect().head.getDouble(3)
      assert(math.abs(adc - exact) < 1e-9,
        s"vec $vid: adc $adc != exact $exact")
    }
  }

  test("codes are bit-stable under partitioning") {
    def codesAt(p: Int) = ProductQuantizer
      .encode(fixture.repartition(p), col("vec_id"), col("embedding"),
        model)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
      .map { case (id, c) => (id, c.toSeq) }.toSeq
    assert(codesAt(1) == codesAt(7))
  }

  test("incremental encode: batches encoded against the frozen codebook " +
      "and appended equal the one-shot code table (maintained PQ index — " +
      "the X26 leg of the X27/X29 daily-ingest pattern)") {
    // The codebook is a versioned offline artifact (fit once on a bounded
    // historical sample); daily batches encode against it in one map pass
    // and append. Encoding is per-vector independent, so the fold must be
    // bit-identical to a from-scratch encode — and a silent codebook refit
    // between batches would break exactly this equality.
    def tbl(df: org.apache.spark.sql.DataFrame) = ProductQuantizer
      .encode(df, col("vec_id"), col("embedding"), model)
      .as[(Long, Array[Byte])].collect()
      .map { case (id, c) => (id, c.toSeq) }.toSeq.sortBy(_._1)
    val oneShot = tbl(fixture)
    val folded = (0 until 3)
      .map(i => tbl(fixture.filter(pmod(col("vec_id"), lit(3)) === i)))
      .reduce(_ ++ _).sortBy(_._1)
    assert(folded == oneShot)
    assert(folded.nonEmpty)
  }

  test("compression: a 16-dim float vector becomes 4 bytes of code") {
    val c = ProductQuantizer.encode(fixture,
      col("vec_id"), col("embedding"), model)
      .as[(Long, Array[Byte])].head()
    assert(c._2.length == 4) // vs 16 floats = 64 bytes -> 16x
  }

  test("ADC top-k recall on clustered data: finds the query's cluster") {
    // ground truth: brute-force L2 top-3 per query
    val vecs = fixture.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val queries = vecs.filter(_._1 < 20)
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
    val truth = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (vid, v) => (l2(qv, v), vid) }
        .sortBy(x => (x._1, x._2)).take(3).map(_._2).toSet
    }.toMap
    val codes = ProductQuantizer.encode(fixture,
      col("vec_id"), col("embedding"), model).cache()
    val got = ProductQuantizer
      .adcTopK(codes, model, queries.map { case (q, v) => (q, v) }.toSeq,
        topK = 20)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = queries.map { case (qid, _) =>
      (truth(qid) intersect got(qid)).size.toDouble / truth(qid).size
    }.sum / queries.length
    info(f"PQ ADC recall@3-in-20: $recall%.3f")
    // within-cluster ordering differences are noise-scale (0.05) while PQ
    // quantization error is codebook-scale, so the SHORTLIST is what PQ
    // owes us — production IVF-PQ exact-re-ranks it (q110 does). A
    // 20-of-400 (5%) shortlist must recover nearly all of the exact top-3.
    assert(recall >= 0.85, f"recall $recall%.3f below gate")
  }

  test("ADC shortlist is partition-invariant even with tied distances") {
    // duplicate-heavy corpus: many vectors share codes, so adc ties are
    // guaranteed at the k boundary — the shortlist must still be the
    // same exact (dist, vid) prefix for any partitioning.
    val base = fixture.limit(10).collect().map(_.getSeq[Float](1))
    val dup = (0L until 200L).map { i =>
      (i, base((i % 10).toInt)) // 20 copies of each of 10 vectors
    }.toDF("vec_id", "embedding")
    val codes = ProductQuantizer.encode(dup, col("vec_id"),
      col("embedding"), model)
    val q = Seq((999L, base(0).map(_.toDouble).toArray))
    def listAt(p: Int) = ProductQuantizer
      .adcTopK(codes.repartition(p), model, q, topK = 7)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(listAt(1) == listAt(5))
    // and the prefix is the lexicographic (dist, vid) minimum: with 20
    // exact copies of the query's own vector, the tied block must come
    // out in ascending vec_id order
    val ids = listAt(5).map(_._2)
    assert(ids == ids.sorted.take(7))
  }

  test("IVF-PQ: ADC distance equals exact distance to the reconstruction " +
    "(cell centroid + decoded residual)") {
    val ivf = ProductQuantizer.fitResidual(fixture, "vec_id", "embedding",
      dim = Dim, cells = 4, m = 4, k = 16, iters = 5, seed = 7L)
    val codes = ProductQuantizer.encodeIvf(fixture, "vec_id", "embedding",
      ivf).cache()
    val q = fixture.limit(1).collect().head
      .getSeq[Float](1).map(_.toDouble).toArray
    // probe ALL cells so every code is scored; check each returned adc
    // against the from-first-principles reconstruction distance
    val got = ProductQuantizer.ivfAdcTopK(codes, ivf,
      Seq((-1L, q)), topK = 10, nprobe = 4).collect()
    val codeOf = codes.as[(Long, Int, Array[Byte])].collect()
      .map(c => c._1 -> (c._2, c._3)).toMap
    got.foreach { r =>
      val (cell, code) = codeOf(r.getLong(2))
      val rec = ivf.reconstruct(cell, code)
      val exact = q.indices.map(i => {
        val d = q(i) - rec(i); d * d
      }).sum
      assert(math.abs(r.getDouble(3) - exact) < 1e-9)
    }
  }

  test("IVF-PQ fixes the uniform hard case: recall >= 0.8 under " +
    "inverted-list pruning where 4-bit plain PQ manages ~0.53") {
    // What the r6 hard case actually showed: k=16 codebooks (4 bits per
    // subspace) starve a structure-free corpus. The IVFADC composition
    // measured here uses the FAISS-standard 8-bit codebooks (m=8, k=256 —
    // still 8-byte codes, 32x compression) on cell RESIDUALS, and probes
    // 12 of 16 cells. Sweep results this corpus/seed: plain PQ k=256
    // full-scan 0.983; IVF-PQ nprobe=12 hits 0.967 against a 0.983
    // probe-ceiling (true neighbors whose cell is probed) — the prune
    // costs ~nothing in recall while capping the scan at nprobe/cells.
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val vecs = e.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val ivf = ProductQuantizer.fitResidual(e, "vec_id", "embedding",
      dim = 64, cells = 16, m = 8, k = 256, iters = 5, seed = 11L)
    val codes = ProductQuantizer.encodeIvf(e, "vec_id", "embedding", ivf)
      .cache()
    val queries = vecs.filter(_._1 < 20)
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
    val truth = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (vid, v) => (l2(qv, v), vid) }
        .sortBy(x => (x._1, x._2)).take(3).map(_._2).toSet
    }.toMap
    val got = ProductQuantizer
      .ivfAdcTopK(codes, ivf, queries.toSeq, topK = 20, nprobe = 12)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = queries.map { case (qid, _) =>
      (truth(qid) intersect got(qid)).size.toDouble /
        truth(qid).size
    }.sum / queries.length
    info(f"IVF-PQ uniform-corpus recall@3-in-20: $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f below gate")
  }

  test("real-corpus recall (uniform 64-dim — the hard case, no cluster " +
    "structure to lean on)") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val vecs = e.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val model = ProductQuantizer.fit(e, col("vec_id"), col("embedding"),
      dim = 64, m = 8, k = 16, iters = 5, seed = 11L)
    val codes = ProductQuantizer.encode(e, col("vec_id"),
      col("embedding"), model)
    val queries = vecs.filter(_._1 < 20)
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
    val truth = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (vid, v) => (l2(qv, v), vid) }
        .sortBy(x => (x._1, x._2)).take(3).map(_._2).toSet
    }.toMap
    val got = ProductQuantizer
      .adcTopK(codes, model, queries.toSeq, topK = 20)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall = queries.map { case (qid, _) =>
      (truth(qid) intersect got(qid)).size.toDouble / truth(qid).size
    }.sum / queries.length
    info(f"real-corpus recall@3-in-20: $recall%.3f")
    // uniform random vectors are PQ's worst case (distances concentrate;
    // 8 bits/subspace of uniform 8-dim noise separates little) — the
    // honest floor is well above chance (20/500 = 4%) but far from the
    // clustered fixture's 0.93.
    assert(recall >= 0.4, f"recall $recall%.3f below the hard-case floor")
  }
}
