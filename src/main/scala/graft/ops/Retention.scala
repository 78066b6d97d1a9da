package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Partition-TTL retention for Hive-partitioned parquet tables — the
  * ClickHouse `TTL ... DELETE` analog and [[Compaction]]'s lifecycle
  * sibling: a continuously-ingested fact table keeps a bounded trailing
  * window of date partitions; everything older is dropped as a
  * METADATA-ONLY operation.
  *
  * Design constraints (the reasons TTL is a first-class engine feature
  * and not a DELETE query):
  *
  *  - **Metadata-only**: expiry never opens a data file — eligibility is
  *    decided from the `day=YYYY-MM-DD` directory NAME alone, so dropping
  *    a year of history from a 100 TB table is a directory listing plus
  *    one rename+delete per dropped day, not a scan. (ClickHouse drops
  *    whole parts the same way when the partition key bounds the TTL
  *    expression; Delta/Iceberg make it a metadata commit.)
  *  - **Idempotent**: re-running with the same cutoff drops zero
  *    partitions ([[RetentionSpec]] pins it).
  *  - **Swap, not in-place**: a dropped partition dir is atomically
  *    renamed to a `.dropped-*` sibling BEFORE its files are deleted, so
  *    a concurrent lister sees the partition whole or absent, never
  *    half-deleted ([[Compaction]]'s swap discipline).
  *  - **Survivors untouched**: retained partition dirs and their files
  *    are never rewritten — the declared q216 oracles the retained
  *    table's row multiset against the raw source under the same date
  *    predicate, which would catch any loss or invention.
  */
object Retention {

  final case class Report(
      partitionsSeen: Int,
      partitionsDropped: Int,
      cutoffDay: java.time.LocalDate)

  private def partitionDay(p: Path): Option[java.time.LocalDate] = {
    val n = p.getFileName.toString
    if (!n.startsWith("day=")) None
    else scala.util.Try(
      java.time.LocalDate.parse(n.stripPrefix("day="))).toOption
  }

  /** List the `day=` partition dirs of `tableDir` (driver-side metadata,
    * the Compaction.stats cost class; Nio.list closes the directory fd).
    */
  def partitionDays(tableDir: String): Seq[(Path, java.time.LocalDate)] =
    Nio.list(Paths.get(tableDir))
      .filter(Files.isDirectory(_))
      .flatMap(p => partitionDay(p).map(p -> _))
      .sortBy(_._2.toEpochDay)

  /** Drop every partition strictly OLDER than the newest `keepDays` days
    * (cutoff = max partition day − keepDays + 1, from directory names
    * alone; a partition survives iff day ≥ cutoff). Returns the cutoff so
    * consumers and oracles can replay the same predicate.
    */
  def expire(tableDir: String, keepDays: Int): Report = {
    require(keepDays > 0, "keepDays must be positive")
    // re-run is the recovery path: a crash between the tombstone rename
    // and the delete leaves an orphaned `.day=*.dropped-*` dir — invisible
    // to readers (dot-prefixed) but never reclaimed. Sweep them first so
    // the documented crash window cannot become an unbounded disk leak.
    Nio.list(Paths.get(tableDir))
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith(".day=") && n.contains(".dropped-")
      }
      .foreach(Nio.deleteTree)
    val parts = partitionDays(tableDir)
    if (parts.isEmpty) return Report(0, 0, java.time.LocalDate.EPOCH)
    val cutoff = parts.map(_._2).maxBy(_.toEpochDay)
      .minusDays(keepDays - 1L)
    var dropped = 0
    parts.foreach { case (dir, day) =>
      if (day.isBefore(cutoff)) {
        // dot-prefixed tombstone: Spark's file index ignores dot/underscore
        // dirs, so even a crash BETWEEN rename and delete leaves nothing a
        // reader would list — the partition is whole or invisible, never a
        // stray string value corrupting day-type inference
        val tomb = dir.resolveSibling(
          s".${dir.getFileName}.dropped-${java.util.UUID.randomUUID}")
        Files.move(dir, tomb, StandardCopyOption.ATOMIC_MOVE)
        Nio.deleteTree(tomb)
        dropped += 1
      }
    }
    Report(parts.size, dropped, cutoff)
  }

  /** Day-partitioned `events` layout with the TTL applied, backing the
    * declared q216: built once per corpus dir (LayoutCache first-touch
    * contract), written the way the ingest sink partitions it, then
    * expired to the trailing 14 days — so the declared query reads
    * exactly what a post-TTL table looks like, and its oracle (raw
    * `events` under the same date predicate in DuckDB) proves the drop
    * removed whole old partitions and nothing else.
    */
  val KeepDays = 14

  def retainedEventsPath(s: SparkSession, d: String): String = {
    import org.apache.spark.sql.functions.{col, date_add, lit}
    val h = LayoutCache.sourceKey(d)
    LayoutCache.installOnce(s, s"ttl216_events_$h") { tmp =>
      graft.Tables.events(s, d)
        .withColumn("day", date_add(lit("1970-01-01").cast("date"),
          Scalars.longDiv("ts", 86400000000000L).cast("int")))
        .repartition(col("day")) // one file per day dir, the ingest shape
        .write.partitionBy("day").parquet(tmp)
      val r = expire(tmp, KeepDays)
      require(r.partitionsDropped > 0,
        "retention build expected old partitions to drop")
    }
  }
}
