package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Z-order layout: interleave correctness against the Scala reference, and
  * the clustering claim itself — a 2-dim box touches few files in the
  * z-layout but nearly all files in an unclustered layout of the same data.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("column zvalue2 matches the bitwise reference") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 11).toLong,
      rnd.nextInt(1 << 7).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zvalue2(col("x"), col("y"), 16).as("zv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, zv) =>
      assert(zv == ZOrder.zvalue2Ref(x, y, 16), s"($x,$y)")
    }
  }

  test("z-layout confines a 2-dim box to few files; unclustered does not") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity")
    val zDir = Files.createTempDirectory("zspec_z").toString
    val hDir = Files.createTempDirectory("zspec_h").toString
    val files = 16
    ZOrder.writeZClustered(li, col("l_partkey"), col("l_suppkey"),
      bits = 16, files = files, path = zDir)
    // unclustered baseline: same data, same file count, hash order
    li.repartition(files).write.mode("overwrite").parquet(hDir)

    // sf0.001 key space is partkey 0..199 × suppkey 0..9; this box is
    // ~2% of it (the declared q104 box targets the sf0.01+ key space).
    def touched(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
      val t = df.filter(col("l_partkey").between(50, 69) &&
          col("l_suppkey").between(2, 3))
        .select(input_file_name().as("f")).distinct().count()
      val all = df.select(input_file_name().as("f")).distinct().count()
      (t, all)
    }
    val (zTouched, zAll) = touched(zDir)
    val (hTouched, hAll) = touched(hDir)
    assert(zAll == files && hAll == files)
    // the box is ~1% of (partkey × suppkey) space: z-clustering must
    // confine it to a small minority of files, while hash order spreads
    // it over (nearly) all of them.
    assert(zTouched * 2 < hTouched,
      s"z-layout touched $zTouched of $zAll vs hash $hTouched of $hAll")
    assert(zTouched <= files / 4,
      s"box escaped its z-tiles: $zTouched of $zAll files")
  }

  test("declared q104 equals the same box on the plain table") {
    // sf0.01: the declared box (500..599 × 20..39) is non-empty there
    // (at sf0.001 it falls outside the key space).
    val d = "/root/testdata/sf0.01"
    val viaLayout = Queries.byName("q104_zorder_box")
      .build(spark, d).collect().toSeq
    val plain = Tables.lineitem(spark, d)
      .filter(col("l_partkey").between(500, 599) &&
        col("l_suppkey").between(20, 39))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag").collect().toSeq
    assert(viaLayout == plain)
  }
}
