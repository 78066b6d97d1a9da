package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Algebraic invariants of the round-9 curation operators that a
  * value-level oracle cannot express directly, checked on adversarial
  * source-count shapes the fixed testdata never produces.
  */
class CurationInvariantSpec extends SparkSpec {
  import spark.implicits._

  /** A documents dir with the given per-source doc counts (texts are
    * trivially distinct so dedup machinery stays out of the way).
    */
  private def docsDir(counts: Seq[(String, Int)]): String = {
    val d = Files.createTempDirectory("curinv").toString
    counts.zipWithIndex.flatMap { case ((src, n), si) =>
      (0 until n).map { i =>
        val id = si * 1000000L + i
        (id, s"doc $si $i unique words here", "en", src, 25L)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q137 largest-remainder allocation sums EXACTLY to the budget on " +
      "skewed, uniform, and singleton source distributions") {
    val shapes = Seq(
      Seq("a" -> 1, "b" -> 1, "c" -> 1),               // uniform tiny
      Seq("a" -> 997, "b" -> 3, "c" -> 500, "d" -> 1), // skewed + primes
      Seq("solo" -> 42),                               // one source
      Seq("a" -> 7, "b" -> 7, "c" -> 7, "d" -> 7,
        "e" -> 7, "f" -> 7, "g" -> 13))                // remainder ties
    shapes.foreach { shape =>
      val out = Queries.byName("q137_mix_allocation")
        .build(spark, docsDir(shape)).collect()
      val total = out.map(_.getAs[Long]("alloc")).sum
      assert(total == 100000L,
        s"sum(alloc) = $total != 100000 for $shape: ${out.mkString(", ")}")
      // α=1/2 flattening: allocation shares are ordered like counts but
      // strictly flatter — the largest source's share of the budget must
      // not exceed its share of the corpus (when sources differ)
      if (shape.map(_._2).distinct.size > 1) {
        val n = shape.map(_._2.toLong).sum
        val (maxSrc, maxN) = shape.maxBy(_._2)
        val a = out.find(_.getAs[String]("source") == maxSrc).get
          .getAs[Long]("alloc")
        assert(a.toDouble / 100000 < maxN.toDouble / n + 1e-9,
          s"$maxSrc not flattened: alloc $a of 100000 vs $maxN of $n docs")
      }
    }
  }

  test("q136 OOV reconciles: a vocabulary covering every token drives " +
      "oov to zero; oov_tok never exceeds n_tok") {
    // 3 distinct tokens per doc, few docs → well under the 64-token vocab:
    // every token is in-vocab, so oov must be exactly 0 for every source
    val d = docsDir(Seq("a" -> 3, "b" -> 2))
    val out = Queries.byName("q136_vocab_coverage").build(spark, d).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("oov_tok") == 0L && r.getAs[Long]("oov_ppm") == 0L,
        s"small-vocab corpus has oov: $r")
    }
    // and on the real testdata the rate is a proper fraction
    val real = Queries.byName("q136_vocab_coverage").build(spark, sf).collect()
    real.foreach { r =>
      assert(r.getAs[Long]("oov_tok") <= r.getAs[Long]("n_tok"), s"$r")
      assert(r.getAs[Long]("oov_ppm") <= 1000000L, s"$r")
    }
  }

  test("q135 soft-dedup weights reconcile: eff_ppm ≤ 1e6·n_docs with " +
      "equality exactly when no doc of the source is clustered; " +
      "kept ≤ n_docs") {
    val out = Queries.byName("q135_soft_dedup_sample").build(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val eff = r.getAs[Long]("eff_ppm")
      assert(eff <= 1000000L * n && eff > 0, s"weight out of range: $r")
      assert(r.getAs[Long]("kept_docs") <= n, s"kept > docs: $r")
    }
    // corpus-wide: soft dedup must shrink the effective size (the sf0.01
    // corpus has near-dup clusters by construction)
    val effTotal = out.map(_.getAs[Long]("eff_ppm")).sum
    val nTotal = out.map(_.getAs[Long]("n_docs")).sum
    assert(effTotal < 1000000L * nTotal,
      s"no shrink: eff $effTotal vs ${1000000L * nTotal}")
  }

  test("q134 RRF: every fused row carries at least one leg rank; a doc " +
      "ranked by both legs outscores the same ranks taken singly") {
    val out = Queries.byName("q134_rrf_hybrid").build(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lex = Option(r.getAs[Integer]("r_lex"))
      val den = Option(r.getAs[Integer]("r_dense"))
      assert(lex.isDefined || den.isDefined, s"rankless fused row: $r")
      val expect =
        lex.map(v => 1000000000L / (60L + v.intValue)).getOrElse(0L) +
        den.map(v => 1000000000L / (60L + v.intValue)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_fp") == expect, s"fusion arithmetic: $r")
    }
    // descending by fused score with doc_id tiebreak (driver dump order)
    val scores = out.map(r => (r.getAs[Long]("rrf_fp"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy { case (s2, id) => (-s2, id) }),
      s"fusion output not rank-ordered: ${scores.mkString(", ")}")
  }

  test("q143 cluster-aware split is leakage-free by construction: the " +
      "q128 audit run against THIS split finds zero straddling pairs " +
      "(and the doc-hash split it replaces does leak on the same corpus)") {
    val fold = pipelines.DedupPipeline.cachedFold(spark, sf)
    val docs = Tables.documents(spark, sf).select("doc_id")
    val clusterSplit = docs
      .join(fold.labels, docs("doc_id") === fold.labels("v"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("b", pmod(ops.Scalars.tokenHash(
        concat(lit("csplit:"), col("cluster").cast("string"))), lit(100L)))
      .select(col("doc_id"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
    val pairs = QueriesText.bandPairsFrom(fold.bands)
    def straddling(splits: org.apache.spark.sql.DataFrame): Long = pairs
      .join(splits.select(col("doc_id").as("a_id"),
        col("split").as("a_split")), Seq("a_id"))
      .join(splits.select(col("doc_id").as("b_id"),
        col("split").as("b_split")), Seq("b_id"))
      .filter(col("a_split") =!= col("b_split")).count()
    assert(straddling(clusterSplit) == 0L,
      "cluster-keyed split leaked a near-dup pair across splits")
    // the guarantee is not vacuous: the plain per-doc hash split (X11)
    // DOES straddle pairs on this corpus (q128's finding)
    val docSplit = Tables.documents(spark, sf)
      .withColumn("b", pmod(ops.Scalars.tokenHash(
        concat(lit("split:"), col("doc_id").cast("string"))), lit(100L)))
      .select(col("doc_id"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
    assert(straddling(docSplit) > 0L,
      "corpus has no straddling pairs under the doc split — " +
        "the leakage-free claim would be vacuous")
  }

  /** JVM replica of Scalars.tokenHash (md5 hex first 15 digits → long). */
  private def tokenHashLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("q154 budget materialization matches an independent local model " +
      "on skewed source shapes: Hamilton budgets sum EXACTLY to B, kept " +
      "set is the hash-order prefix, crossing doc included") {
    val shapes = Seq(
      Seq("a" -> 1, "b" -> 1, "c" -> 1),
      Seq("a" -> 997, "b" -> 3, "c" -> 500, "d" -> 1),
      Seq("solo" -> 42),
      Seq("a" -> 7, "b" -> 7, "c" -> 7, "d" -> 13))
    shapes.foreach { shape =>
      val dir = docsDir(shape)
      val out = Queries.byName("q154_budget_materialize")
        .build(spark, dir).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("budget_tok"), r.getAs[Long]("kept_docs"),
            r.getAs[Long]("kept_tok"))).toMap
      // local model from first principles (docsDir texts are 6 tokens:
      // "doc $si $i unique words here")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("source", "doc_id").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      val nTok = docs.groupBy(_._1).view.mapValues(_.length * 6L).toMap
      val b = nTok.values.sum / 2
      val wFp = nTok.view
        .mapValues(n => math.floor(1e6 * math.sqrt(n.toDouble)).toLong)
        .toMap
      val wTot = wFp.values.sum
      val base = wFp.map { case (s0, w) => s0 -> (b * w / wTot) }
      val rem = wFp.map { case (s0, w) => s0 -> (b * w % wTot) }
      val leftover = b - base.values.sum
      val ranked = rem.toSeq.sortBy { case (s0, r) => (-r, s0) }
        .map(_._1).zipWithIndex.toMap
      val budget = base.map { case (s0, a) =>
        s0 -> (a + (if (ranked(s0) < leftover) 1L else 0L))
      }
      assert(budget.values.sum == b,
        s"$shape: model budgets do not sum to B — test bug")
      shape.map(_._1).foreach { s0 =>
        val ordered = docs.filter(_._1 == s0)
          .map { case (_, id) => (tokenHashLocal(s"pack:$id"), id) }
          .sortBy(identity)
        var cum = 0L
        val kept = ordered.takeWhile { _ =>
          val keep = cum < budget(s0); cum += 6L; keep
        }
        val (gotB, gotD, gotT) = out(s0)
        assert(gotB == budget(s0),
          s"$shape/$s0: budget $gotB != model ${budget(s0)}")
        assert(gotD == kept.length.toLong && gotT == kept.length * 6L,
          s"$shape/$s0: kept ($gotD docs, $gotT tok) != model " +
            s"(${kept.length} docs, ${kept.length * 6L} tok)")
      }
      assert(out.map(_._2._1).sum == b,
        s"$shape: query budgets do not sum exactly to B")
    }
  }
}
