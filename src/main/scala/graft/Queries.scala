package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: a Spark build plus (usually) a DuckDB oracle.
  * Naming, determinism, and column-alias rules: SURVEY.md §2 intro + §7.5.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Registry of every declared query from SURVEY.md §2 — the driver contract
  * surface. Split by tier; see QueriesRel / QueriesScalar / QueriesText.
  */
object Queries {
  lazy val all: Seq[Q] = QueriesRel.all ++ QueriesScalar.all ++
    QueriesText.all ++ QueriesOlap.all ++ QueriesPipeline.all ++
    QueriesTime.all ++ QueriesCuration.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
