package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Scalars

/** Property-based invariants (SURVEY.md §5 #3), driven by raw ScalaCheck
  * inside funsuite (no scalatestplus bridge in the offline cache). Each
  * forAll sample evaluates one small Spark job over a generated batch, so
  * sample counts are kept low — the generators, not the count, carry the
  * edge-case search (mixed-case schemes, www-only hosts, trailing slashes,
  * empty paths, chunk sizes vs row counts, page sizes vs table size).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // --- generators -----------------------------------------------------------
  private val scheme = Gen.oneOf("http://", "https://", "HTTP://", "HTTPS://",
    "HtTpS://", "")
  private val www = Gen.oneOf("www.", "WWW.", "")
  private val host = Gen.oneOf("example.com", "foo.co.uk", "www-only.io",
    "a.b.c.d.example.org")
  private val path = Gen.oneOf("", "/", "/x", "/x/", "/deep/path/page.html",
    "/trailing//")

  private val urlGen: Gen[String] = for {
    s <- scheme; w <- www; h <- host; p <- path
  } yield s"$s$w$h$p"

  // --- F1 urlBone: differential against a model of the reference ----------
  /** Reference `get_url_bone` (`rankings_generator.py:132-139`): strip one
    * scheme+www prefix case-insensitively, then ONE trailing slash (the
    * reference's `url[:-1]`, so `.../x//` keeps one slash — urlBone is
    * deliberately not idempotent on double-trailing-slash inputs).
    */
  private def urlBoneModel(url: String): String = {
    val noPrefix = url.replaceFirst("(?i)^https?://(www\\.)?", "")
    if (noPrefix.endsWith("/")) noPrefix.dropRight(1) else noPrefix
  }

  test("urlBone matches the reference model; idempotent off the // edge") {
    check(Prop.forAll(Gen.listOfN(40, urlGen)) { urls =>
      val rows = urls.toDF("url")
        .select(col("url"), Scalars.urlBone(col("url")).as("b1"))
        .select(col("url"), col("b1"), Scalars.urlBone(col("b1")).as("b2"))
        .collect()
      rows.forall { r =>
        val (url, b1, b2) = (r.getString(0), r.getString(1), r.getString(2))
        b1 == urlBoneModel(url) &&
          !b1.toLowerCase.startsWith("http://") &&
          !b1.toLowerCase.startsWith("https://") &&
          (url.endsWith("//") || b1 == b2)
      }
    })
  }

  // --- F12 chunkify: chunks partition the input, each within size ----------
  test("chunkId partitions rows: disjoint cover, every chunk <= size") {
    val cases = for {
      rows <- Gen.choose(1, 500)
      size <- Gen.choose(1, 60)
    } yield (rows, size)
    check(Prop.forAll(cases) { case (rows, size) =>
      val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      val chunks = spark.range(rows).toDF("id")
        .select(col("id"),
          Scalars.chunkId(row_number().over(w), size).as("chunk"))
        .groupBy("chunk").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val total = chunks.values.sum
      val contiguous = chunks.keySet == (0L until chunks.size.toLong).toSet
      val bounded = chunks.values.forall(_ <= size)
      val lastPartial = chunks.filter(_._2 < size).keySet
        .forall(_ == chunks.size - 1L)
      total == rows && contiguous && bounded && lastPartial
    })
  }

  // --- O1/O2 pagination: limit/offset pages reassemble the sorted whole ---
  test("limit/offset pages reassemble the totally-ordered table exactly") {
    val orders = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey")
    val expected = orders.collect().map(_.getLong(0)).toSeq
    check(Prop.forAll(Gen.choose(100, 700)) { pageSize =>
      val pages = Iterator.from(0)
        .map(p => orders.offset(p * pageSize).limit(pageSize)
          .collect().map(_.getLong(0)).toSeq)
        .takeWhile(_.nonEmpty)
        .toSeq
      pages.flatten == expected && pages.init.forall(_.size == pageSize)
    }, n = 5)
  }

  // --- J2/J3: semi ∪ anti = identity, disjoint ------------------------------
  test("semi-join and anti-join partition the left table") {
    val keySets = for {
      left <- Gen.listOfN(80, Gen.choose(0L, 40L)).map(_.distinct)
      right <- Gen.listOfN(40, Gen.choose(0L, 40L)).map(_.distinct)
    } yield (left, right)
    check(Prop.forAll(keySets) { case (left, right) =>
      val l = left.toDF("k")
      val r = right.toDF("k")
      val semi = l.join(r, Seq("k"), "left_semi")
        .collect().map(_.getLong(0)).toSet
      val anti = l.join(r, Seq("k"), "left_anti")
        .collect().map(_.getLong(0)).toSet
      (semi intersect anti).isEmpty &&
        (semi union anti) == left.toSet &&
        semi == (left.toSet intersect right.toSet)
    })
  }

  // --- R3: seeded generator (sources/SeededGenerator) ----------------------
  test("seeded generator: deterministic, partitioning-independent, in-domain") {
    import graft.sources.SeededGenerator
    val n = 500L
    val a = SeededGenerator.rankings(spark, n, seed = 7L)
    val b = SeededGenerator.rankings(spark, n, seed = 7L)
      .repartition(13) // content must not depend on partitioning
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // a different seed must actually change the stream
    val c = SeededGenerator.rankings(spark, n, seed = 8L)
    assert(a.exceptAll(c).count() > 0)
    // schema parity with the CSV ingest contract
    assert(a.schema.map(f => (f.name, f.dataType)) ==
      Tables.rankingsV1Schema.map(f => (f.name, f.dataType)))
    val rows = a.collect()
    assert(rows.length == n)
    // reference value domains: rank 1..100, volume >= 10 step 10, cpc 0..10,
    // date within 360 days before asOf, exactly 4 domains in blocks
    assert(rows.forall { r =>
      val rank = r.getAs[Int]("rank")
      val vol = r.getAs[Long]("volume")
      val cpc = r.getAs[Double]("cpc")
      rank >= 1 && rank <= 100 && vol >= 10 && vol % 10 == 0 &&
        cpc >= 0.0 && cpc <= 10.0
    })
    assert(a.select("domain").distinct().count() == 4)
    val asOf = java.sql.Date.valueOf("2023-03-15")
    assert(rows.forall { r =>
      val d = r.getAs[java.sql.Date]("date")
      !d.after(asOf) &&
        d.toLocalDate.isAfter(asOf.toLocalDate.minusDays(361))
    })
  }

  test("seeded generator: typed form matches rankingsV1Schema exactly") {
    import graft.sources.SeededGenerator
    val t = SeededGenerator.rankingsTyped(spark, 50L, seed = 3L)
    assert(t.schema == Tables.rankingsV1Schema)
    assert(t.count() == 50)
  }
}
