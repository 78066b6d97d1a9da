package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External JDBC topic source (SURVEY.md §2.1 S10).
  *
  * The reference pulls its work list — tracked topics — from Postgres:
  * `s3_rankings_collector.py:129-142` (asyncpg `SELECT topic FROM
  * topics_to_schedule WHERE last_time_scheduled > ts ORDER BY ... LIMIT
  * ... OFFSET ...`) and `rankings_generator.py:117-129` (SQLAlchemy, same
  * table, status/tracked predicates). The Spark-first realization is
  * `spark.read.jdbc`: the predicate and column pruning push into the
  * remote database as SQL, and the scan parallelizes across executors via
  * `partitionColumn` bounds instead of the reference's driver-side
  * page_no/page_size loop.
  *
  * Scale posture: a topics table is dimension-sized — read it once with a
  * bounded partition count (each partition is one DB connection; hundreds
  * of concurrent connections would dos the database, so `numPartitions`
  * stays small and the result is `broadcast()` into fact joins downstream.
  * Never point this at a fact table; facts belong in columnar storage.
  */
object JdbcSource {

  /** Connection seam: url + credentials + driver, defaulting to an
    * embedded Derby URL so the seam is exercisable with zero external
    * infrastructure (the unit test) and swappable for Postgres in
    * production by changing ONLY this value.
    */
  final case class Conn(
      url: String,
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None) {
    def properties: Properties = {
      val p = new Properties()
      user.foreach(p.setProperty("user", _))
      password.foreach(p.setProperty("password", _))
      driver.foreach(p.setProperty("driver", _))
      p
    }
  }

  /** Whole-table (or pushed-subquery) read over one connection. `table`
    * accepts either a table name or a parenthesized subquery alias —
    * `"(SELECT topic FROM topics_to_schedule WHERE ...) t"` — which ships
    * the predicate to the database, the jdbc analog of parquet pushdown.
    */
  def read(spark: SparkSession, conn: Conn, table: String): DataFrame =
    spark.read.jdbc(conn.url, table, conn.properties)

  /** Range-partitioned parallel read: Spark issues one
    * `WHERE partCol BETWEEN ...` query per partition — the distributed
    * replacement for the reference's sequential LIMIT/OFFSET paging.
    */
  def readPartitioned(
      spark: SparkSession,
      conn: Conn,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(conn.url, table, partitionColumn,
      lowerBound, upperBound, numPartitions, conn.properties)

  /** The reference's `fetch_tracked_topics` shape over jdbc: recently
    * scheduled tracked topics, newest first, one page
    * (`rankings_generator.py:117-129`). The paging/ordering runs in the
    * database via the subquery pushdown; Spark sees only the page.
    */
  def trackedTopics(
      spark: SparkSession,
      conn: Conn,
      sinceTs: Long,
      pageSize: Int,
      pageNo: Int): DataFrame = {
    val offset = (pageNo - 1) * pageSize
    read(spark, conn,
      s"""(SELECT topic FROM topics_to_schedule
         | WHERE status = 'processed' AND tracked = true
         |   AND last_update_timestamp > $sinceTs
         | ORDER BY last_update_timestamp DESC
         | OFFSET $offset ROWS FETCH NEXT $pageSize ROWS ONLY) t"""
        .stripMargin)
  }

  /** Local-table fallback for environments with no reachable database:
    * same output schema as [[trackedTopics]] so downstream pipelines are
    * source-agnostic. Topics are derived from the documents table's
    * distinct languages ++ a synthetic id — any dimension-shaped local
    * frame works; the contract is the (topic: string) column.
    */
  def trackedTopicsLocal(
      spark: SparkSession,
      sfDir: String,
      pageSize: Int): DataFrame =
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("lang").as("topic")).distinct()
      .orderBy("topic").limit(pageSize)
}
