package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ParquetBloom

/** Bloom-filter row-group skipping for point lookups on a non-sort
  * column (q104's measurement pattern, one level down: row groups instead
  * of files). The layout is orders sorted by o_orderkey, so every row
  * group's o_custkey min/max spans ~the whole customer range — the stats
  * tier can prune nothing and blooms are the only skipping mechanism.
  */
class ParquetBloomSpec extends SparkSpec {

  private val D = "/root/testdata/sf0.01" // 15k orders -> many row groups

  // cust_ref = xxhash64(o_custkey): the production point-lookup shape — a
  // surrogate/hashed id, high-NDV and SPARSE in its domain, so "absent key
  // inside [min, max]" is the normal case, not a corner one. (The raw
  // sf0.01 custkeys are dense 1..N: every in-range key exists, which is
  // the one shape where a point lookup never misses.)
  private lazy val layout: String = {
    val dir = Files.createTempDirectory("bloomspec").toString
    val orders = Tables.orders(spark, D)
      .select(col("o_orderkey"), xxhash64(col("o_custkey")).as("cust_ref"),
        col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
      .coalesce(1)
    ParquetBloom.writeWithBloom(orders, dir, ndv = 2000,
      blockSize = 64 * 1024, "cust_ref")
    dir
  }

  private lazy val partFile: String = {
    val f = new java.io.File(layout).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(f.length == 1)
    f.head.getAbsolutePath
  }

  test("the write option lands a bloom filter in the footer; a plain " +
    "write does not") {
    assert(ParquetBloom.hasBloomFilter(partFile, "cust_ref"))
    val plainDir = Files.createTempDirectory("bloomspec_plain").toString
    spark.read.parquet(layout)
      .coalesce(1).write.mode("overwrite").parquet(plainDir)
    val plainFile = new java.io.File(plainDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    assert(!ParquetBloom.hasBloomFilter(plainFile, "cust_ref"))
  }

  test("stats cannot skip a point predicate on the non-sort column; " +
    "blooms confine an absent key to ~zero row groups") {
    // an absent key INSIDE [min, max]: hashes spread over the Long range,
    // so a small literal sits inside the span and misses every actual key
    val absentInRange = 12345L
    val keys = spark.read.parquet(layout).select("cust_ref")
      .distinct().collect().map(_.getLong(0))
    assert(keys.min < absentInRange && absentInRange < keys.max)
    assert(!keys.contains(absentInRange))
    val (statsOnly, total) = ParquetBloom.survivingRowGroups(
      partFile, "cust_ref", absentInRange, useStats = true, useBloom = false)
    val (bloomed, _) = ParquetBloom.survivingRowGroups(
      partFile, "cust_ref", absentInRange, useStats = true, useBloom = true)
    info(s"row groups: total=$total statsOnly=$statsOnly bloom=$bloomed")
    assert(total >= 4, s"layout too coarse to measure: $total row groups")
    // every group's min/max spans ~the whole hash range: stats keep all
    assert(statsOnly >= total / 2,
      s"stats unexpectedly pruned an unsorted column: $statsOnly of $total")
    // the bloom tier is what zeroes the scan (≤1 tolerates one fpp hit)
    assert(bloomed <= 1,
      s"bloom filters left $bloomed of $total row groups for an absent key")
    assert(bloomed < statsOnly)
  }

  test("the declared q114 layout carries the o_custkey bloom and equals " +
    "the plain-table lookup") {
    val layoutDir = ParquetBloom.bloomOrdersPath(spark, sf)
    val part = new java.io.File(layoutDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    assert(ParquetBloom.hasBloomFilter(part, "o_custkey"))
    val viaLayout = Queries.byName("q114_bloom_lookup")
      .build(spark, sf).collect().toSeq
    val plain = Tables.orders(spark, sf)
      .filter(col("o_custkey") === 42)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey").collect().toSeq
    assert(viaLayout == plain && plain.nonEmpty)
  }

  test("a present key survives the bloom tier and Spark reads the right " +
    "rows through the bloom-enabled layout") {
    val someCust = Tables.orders(spark, D)
      .agg(min("o_custkey")).head.getLong(0)
    val present = Tables.orders(spark, D)
      .filter(col("o_custkey") === someCust)
      .select(xxhash64(col("o_custkey"))).head.getLong(0)
    val (bloomed, total) = ParquetBloom.survivingRowGroups(
      partFile, "cust_ref", present, useStats = true, useBloom = true)
    assert(bloomed >= 1, "present key filtered away")
    info(s"present key: $bloomed of $total row groups")
    val expected = Tables.orders(spark, D)
      .filter(col("o_custkey") === someCust)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val got = spark.read.parquet(layout)
      .filter(col("cust_ref") === present)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
  }
}
