package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.DataFrame

/** Parquet bloom filters for point lookups on NON-sort columns — the
  * row-group-skipping tier that min/max statistics cannot provide.
  *
  * A table has one physical sort order (or one z-order pair); a point
  * predicate on any OTHER high-cardinality column finds every row group's
  * min/max spanning ~the full key range, so stats prune nothing and a
  * single-key lookup scans the table. The KV-lookup reality behind S9/q10
  * at 100 TB is exactly this shape: orders laid out by date/orderkey,
  * probed by customer key.
  *
  * Bloom filters answer "might this row group contain key K?" in O(1)
  * per group from footer-adjacent metadata: a point lookup reads the
  * handful of groups whose bloom fires (≈ the true containing groups +
  * fpp·groups false positives) instead of all of them — turning the scan
  * cost from O(table) to O(occurrences). Spark's parquet reader applies
  * them on read automatically (`parquet.filter.bloom.enabled`, default
  * on); the write side is pure configuration, which is what
  * [[writeWithBloom]] packages.
  *
  * Dictionary note: bloom filters earn their keep precisely when the
  * column's NDV outgrows dictionary encoding (parquet omits the bloom
  * when a column is fully dictionary-encoded — the dictionary is already
  * an exact membership filter). The writer therefore disables dictionary
  * encoding for the bloom columns, mirroring the high-NDV production
  * shape at the small test scale.
  */
object ParquetBloom {

  /** Write `df` with a bloom filter on each of `cols` (expected NDV sizes
    * the filter's bit array; fpp defaults to 1%). `blockSize` caps the
    * row-group size so the spec's layout has many groups to skip.
    */
  def writeWithBloom(df: DataFrame, path: String, ndv: Long,
      blockSize: Int, cols: String*): Unit = {
    val base = df.write.mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
    cols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.parquet(path)
    ()
  }

  /** `(surviving, total)` row groups of one parquet file for the point
    * predicate `column = key`, with the stats and bloom filter tiers
    * toggled independently (dictionary filtering off in both arms so the
    * measurement isolates what blooms contribute — see the class doc).
    * This is the same row-group arithmetic the real scan does: parquet's
    * reader drops filtered groups before any page I/O.
    */
  def survivingRowGroups(file: String, column: String, key: Long,
      useStats: Boolean, useBloom: Boolean): (Int, Int) = {
    val conf = new Configuration()
    val in = HadoopInputFile.fromPath(new Path(file), conf)
    val total = {
      val r = ParquetFileReader.open(in)
      try r.getRowGroups.size finally r.close()
    }
    val pred = FilterApi.eq(FilterApi.longColumn(column),
      java.lang.Long.valueOf(key))
    val opts = HadoopReadOptions.builder(conf)
      .withRecordFilter(FilterCompat.get(pred))
      .useStatsFilter(useStats)
      .useDictionaryFilter(false)
      .useBloomFilter(useBloom)
      .build()
    val r = ParquetFileReader.open(in, opts)
    try (r.getRowGroups.size, total) finally r.close()
  }

  /** Orders laid out by o_orderkey with a bloom filter on o_custkey —
    * the declared q114 lookup layout, built once per sf dir
    * ([[LayoutCache]] atomic-install contract, q104's lifecycle). The
    * physical sort serves orderkey ranges; the bloom serves point lookups
    * on the non-sort customer key, which is the scan-skipping q114
    * demonstrates (result layout-independent, oracled on the plain
    * table). Row groups capped small so even the sf0.01 layout has
    * several to skip; production uses the default 128 MB.
    */
  def bloomOrdersPath(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val h = LayoutCache.sourceKey(d)
    LayoutCache.installOnce(s, s"bloom114_orders_$h") { tmp =>
      val orders = graft.Tables.orders(s, d)
      // size the filter to the column's actual NDV (approx is fine — the
      // ndv only dials the bit-array size / fpp tradeoff)
      val ndv = orders.select(
        org.apache.spark.sql.functions.approx_count_distinct("o_custkey"))
        .head.getLong(0)
      writeWithBloom(orders.orderBy("o_orderkey"),
        tmp, ndv = math.max(ndv, 64L), blockSize = 256 * 1024, "o_custkey")
    }
  }

  /** True iff the file's first row group carries a bloom filter for
    * `column` (footer-level evidence the write option took effect).
    */
  def hasBloomFilter(file: String, column: String): Boolean = {
    val conf = new Configuration()
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val bd = r.getRowGroups.get(0)
      import scala.jdk.CollectionConverters._
      bd.getColumns.asScala
        .find(_.getPath.toDotString == column)
        .exists(c => r.getBloomFilterDataReader(bd)
          .readBloomFilter(c) != null)
    } finally r.close()
  }
}
