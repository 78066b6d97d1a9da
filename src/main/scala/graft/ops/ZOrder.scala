package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout answer to "queries filter
  * on TWO dimensions but the table can only be sorted by one".
  *
  * Reference behavior: the reference's warehouse filters rankings by
  * (domain, date) style 2-dim boxes; a single-column sort order serves one
  * dimension and scans everything for the other. Interleaving the bits of
  * both keys gives a 1-dim sort order in which any 2-dim box maps to a
  * small set of contiguous z-ranges — so per-file and per-row-group min/max
  * statistics become tight on BOTH columns at once.
  *
  * Scale design (north star = 100 TB):
  *  - Clustering is `repartitionByRange(zv)` + `sortWithinPartitions(zv)`:
  *    one range shuffle at write time, after which every file owns one
  *    z-tile of (x, y) space. A box predicate then touches only the files
  *    whose tile intersects the box — at 1000 executors the scan schedules
  *    O(box-selectivity) tasks instead of O(total-files). Unlike
  *    partitioning BY both columns, file count does not explode with key
  *    cardinality (dir-partition by two high-card keys is a small-files
  *    disaster; z-order keeps file count a free knob).
  *  - The z-value is pure column composition (shift/mask/or per bit) —
  *    whole-stage codegen, no UDF, no custom expression required.
  *  - Pruning mechanics on Spark: planning-time listing keeps all files
  *    (no partition dirs), but the pushed parquet predicates skip whole
  *    row groups via footer min/max — with sorted files those stats are
  *    tight, so non-intersecting files cost a footer read and nothing
  *    else. ZOrderSpec measures the effect directly (files containing
  *    matches: z-layout ≪ unclustered layout).
  */
object ZOrder {

  /** Morton z-value of two non-negative integral columns: bit i of `x`
    * lands at position 2i+1, bit i of `y` at 2i. `bits` low bits of each
    * are interleaved (higher bits would alias: choose bits ≥ log2(max)).
    */
  def zvalue2(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Scala reference of the same interleave (spec cross-check). */
  def zvalue2Ref(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  /** Write `df` z-clustered on (x, y): range-partition on the z-value into
    * `files` output files, sort within each so row-group stats are tight,
    * then drop the helper column — pruning works off the DATA columns'
    * min/max, which the z-sort makes narrow per file on both dimensions.
    */
  def writeZClustered(df: DataFrame, x: Column, y: Column, bits: Int,
      files: Int, path: String): Unit = {
    df.withColumn("zv", zvalue2(x, y, bits))
      .repartitionByRange(files, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite").parquet(path)
    ()
  }

  /** Bits needed to interleave keys up to `maxKey` without aliasing
    * (`bits ≥ log2(max)+1`), capped at 31 so the z-value stays in a Long.
    */
  def bitsFor(maxKey: Long): Int =
    math.min(31, math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxKey, 1L))))

  /** Lineitem z-clustered on (l_partkey, l_suppkey), built once per sf dir
    * into the session warehouse (same lifecycle as the q13b bucketed
    * layout; [[LayoutCache]] for the cross-JVM atomic-install contract).
    * Bit width is derived from the actual max key at build time (sf1
    * shifts keys into the 1e8 range — a fixed small width would alias
    * every data copy into the same z-tiles and void the pruning).
    */
  def zLineitemPath(s: SparkSession, d: String): String = {
    val h = LayoutCache.sourceKey(d)
    LayoutCache.installOnce(s, s"z104_lineitem_$h") { tmp =>
      val li = graft.Tables.lineitem(s, d)
      val maxKey = li.agg(greatest(max("l_partkey"), max("l_suppkey")))
        .head.get(0).asInstanceOf[Number].longValue
      writeZClustered(li, col("l_partkey"), col("l_suppkey"),
        bits = bitsFor(maxKey), files = 32, tmp)
    }
  }
}
