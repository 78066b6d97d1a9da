package graft

import org.apache.spark.sql.functions._

import graft.ops.Compaction

/** Small-file compaction mechanics (ops/Compaction): data identity,
  * bin-pack arithmetic, incrementality, idempotence, and that the
  * compacted layout still serves partition-pruned scans. The declared
  * q116 oracles the data identity cross-engine; these tests pin the
  * file-level behavior the oracle can't see.
  */
class CompactionSpec extends SparkSpec {

  private def freshFragmented(filesPerDay: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("compact_t").toString
    Tables.events(spark, sf)
      .withColumn("day", date_add(lit("1970-01-01").cast("date"),
        graft.ops.Scalars.longDiv("ts", 86400000000000L).cast("int")))
      .repartition(filesPerDay)
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    dir
  }

  test("compaction preserves the exact row multiset and bin-packs " +
    "every fragmented partition; re-run is a no-op") {
    val dir = freshFragmented(8)
    val before = spark.read.parquet(dir)
      .orderBy("event_id", "day").collect().toSeq
    val pre = Compaction.stats(dir)
    // repartition(8) writes *up to* 8 files per day (empty splits are
    // skipped) — fragmentation is what matters, not the exact count
    assert(pre.nonEmpty && pre.forall(_.files >= 2))

    // generous target: every partition packs to ONE file
    val r = Compaction.compact(spark, dir, 64L * 1024 * 1024)
    assert(r.partitionsSeen == pre.size)
    assert(r.partitionsRewritten == pre.size)
    assert(r.filesBefore == pre.map(_.files).sum)
    assert(r.filesAfter == pre.size)
    assert(Compaction.stats(dir).forall(_.files == 1))

    val after = spark.read.parquet(dir)
      .orderBy("event_id", "day").collect().toSeq
    assert(after == before, "compaction changed the data")

    // idempotent: nothing left to do
    val r2 = Compaction.compact(spark, dir, 64L * 1024 * 1024)
    assert(r2.partitionsRewritten == 0)
    assert(r2.filesAfter == r.filesAfter)
  }

  test("compaction is incremental: already-packed partitions are " +
    "untouched (their files keep their identity)") {
    val dir = freshFragmented(8)
    // pack everything once...
    Compaction.compact(spark, dir, 64L * 1024 * 1024)
    val packedFiles = Compaction.stats(dir)
      .map(st => st.dir.getFileName.toString ->
        java.nio.file.Files.list(st.dir).iterator().next().toString).toMap
    // ...then fragment ONE partition the way a day of micro-batches would
    val one = Compaction.stats(dir).head.dir
    val rows = spark.read.parquet(one.toString)
    val tmp = java.nio.file.Files.createTempDirectory("refrag")
    rows.repartition(6).write.mode("overwrite").parquet(tmp.toString)
    one.toFile.listFiles().foreach(_.delete())
    tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath, one.resolve(f.getName)))

    val r = Compaction.compact(spark, dir, 64L * 1024 * 1024)
    assert(r.partitionsRewritten == 1, s"expected only the refragged day: $r")
    Compaction.stats(dir).filterNot(_.dir == one).foreach { st =>
      val f = java.nio.file.Files.list(st.dir).iterator().next().toString
      assert(f == packedFiles(st.dir.getFileName.toString),
        "an untouched partition was rewritten")
    }
  }

  test("target-size arithmetic: a partition larger than target splits " +
    "into ceil(bytes/target) files, never one mega-file") {
    val dir = freshFragmented(8)
    val st = Compaction.stats(dir).head
    // pick a target that forces >=2 files for this partition
    val target = math.max(1L, st.bytes / 3)
    val expected = ((st.bytes + target - 1) / target).toInt
    assert(expected >= 2)
    Compaction.compact(spark, dir, target)
    val after = Compaction.stats(dir)
      .find(_.dir.getFileName == st.dir.getFileName).get
    assert(after.files == expected,
      s"expected $expected files, got ${after.files}")
  }

  test("the compacted layout still serves planning-time partition " +
    "pruning (day dirs survive the swap)") {
    val path = Compaction.compactedEventsPath(spark, sf)
    val q = spark.read.parquet(path)
      .filter(col("day") === lit("2024-01-08").cast("date"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("PartitionFilters")).get
    assert(scan.contains("PartitionFilters: [") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)].*", "$1")
        .contains("day"),
      s"no day partition filter on the compacted scan:\n$scan")
    assert(q.collect().head.getLong(1) > 0)
  }
}
