package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Retention

/** X100 partition TTL: survivor row-multiset identity with the raw table
  * under the same date predicate, idempotence, metadata-only eligibility,
  * and partition pruning intact on the post-TTL layout.
  */
class RetentionSpec extends SparkSpec {

  private def freshLayout(): String = {
    val tmp = Files.createTempDirectory("ttl_spec").toString
    Tables.events(spark, sf)
      .withColumn("day", date_add(lit("1970-01-01").cast("date"),
        graft.ops.Scalars.longDiv("ts", 86400000000000L).cast("int")))
      .repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(tmp)
    tmp
  }

  test("expire drops exactly the partitions older than the trailing " +
      "window and survivors carry the identical row multiset") {
    val tmp = freshLayout()
    val days = Retention.partitionDays(tmp).map(_._2)
    val r = Retention.expire(tmp, keepDays = 14)
    // cutoff-derived expectations, not a hardcoded 14-partition count:
    // the window is day-based, so a corpus with an empty day must still
    // pass (ADVICE r14) — survivors are exactly the listed days >= cutoff
    val expectSurvive = days.count(!_.isBefore(r.cutoffDay))
    assert(r.partitionsSeen == days.size &&
      r.partitionsDropped == days.size - expectSurvive,
      s"$r from ${days.size} partitions, expected $expectSurvive survivors")
    assert(r.partitionsDropped > 0, "fixture must exercise a real drop")
    assert(Retention.partitionDays(tmp).size == expectSurvive)
    val cutoff = r.cutoffDay.toString
    val survivors = spark.read.parquet(tmp)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
    val expected = Tables.events(spark, sf)
      .withColumn("day", date_add(lit("1970-01-01").cast("date"),
        graft.ops.Scalars.longDiv("ts", 86400000000000L).cast("int")))
      .filter(col("day") >= lit(cutoff).cast("date"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
    assert(survivors.count() > 0)
    assert(survivors.exceptAll(expected).count() == 0 &&
      expected.exceptAll(survivors).count() == 0,
      "survivor rows diverge from the raw table under the same predicate")
  }

  test("idempotent: a second expire with the same window drops zero") {
    val tmp = freshLayout()
    val r1 = Retention.expire(tmp, keepDays = 10)
    assert(r1.partitionsDropped > 0)
    val r2 = Retention.expire(tmp, keepDays = 10)
    assert(r2.partitionsDropped == 0 && r2.cutoffDay == r1.cutoffDay)
  }

  test("keepDays wider than history drops nothing") {
    val tmp = freshLayout()
    val n = Retention.partitionDays(tmp).size
    val r = Retention.expire(tmp, keepDays = 10000)
    assert(r.partitionsDropped == 0 &&
      Retention.partitionDays(tmp).size == n)
  }

  test("partition pruning is intact on the post-TTL layout: a day filter " +
      "reads only that day's files") {
    val tmp = freshLayout()
    Retention.expire(tmp, keepDays = 14)
    val days = Retention.partitionDays(tmp).map(_._2)
    val probe = days.last.toString
    val pruned = spark.read.parquet(tmp)
      .filter(col("day") === lit(probe).cast("date"))
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = pruned.queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(scan.selectedPartitions.partitionCount === 1,
      s"expected 1 surviving partition selected, " +
        s"got ${scan.selectedPartitions.partitionCount}")
    assert(scan.dataFilters.isEmpty,
      s"day predicate leaked into data filters: ${scan.dataFilters}")
  }

  test("a crash-orphaned tombstone dir is swept on the next expire run") {
    val tmp = freshLayout()
    // simulate the documented crash window: rename done, delete not —
    // re-run must reclaim it (expire's sweep is the recovery path)
    val victim = Retention.partitionDays(tmp).head._1
    val tomb = victim.resolveSibling(
      s".${victim.getFileName}.dropped-crashed")
    Files.move(victim, tomb)
    assert(Files.exists(tomb))
    Retention.expire(tmp, keepDays = 10000)
    assert(!Files.exists(tomb), "orphaned tombstone survived the re-run")
  }

  test("declared q216 reads only the retained layout (no raw events " +
      "scan) and returns one row per surviving day partition") {
    val df = Queries.byName("q216_ttl_retention").build(spark, sf)
    assert(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("ttl216_events")),
      df.inputFiles.take(3).mkString(", "))
    // day-window-based, not partition-count-based (ADVICE r14): the
    // layout keeps <= KeepDays day dirs (an empty day has no dir), and
    // the rollup returns exactly one row per surviving dir
    val survivingDays = df.inputFiles
      .flatMap(_.split('/').find(_.startsWith("day="))).distinct.length
    assert(df.count() == survivingDays && survivingDays <= Retention.KeepDays,
      s"rows=${df.count()} dirs=$survivingDays keep=${Retention.KeepDays}")
  }
}
