package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.Tables.Ranking

/** Typed `Dataset[Ranking]` surface (SURVEY.md §1.3: the reference's
  * `Ranking` dataclass, `rankings_generator.py:60-77`, as a case class with
  * an Encoder). Typed ops where compile-time safety helps; the relational
  * registry stays DataFrame-based where schema is dynamic.
  */
object TypedRankings {

  def fromCsv(spark: SparkSession, path: String): Dataset[Ranking] = {
    import spark.implicits._
    graft.Tables.readRankingsCsv(spark, path).as[Ranking]
  }

  /** Null-rejection as a typed filter (P5, `rankings_generator.py:158-162`). */
  def clean(ds: Dataset[Ranking]): Dataset[Ranking] =
    ds.filter(r => r.url.isDefined && r.rank.isDefined)

  /** Rank-range invariant check (UInt8 1–100 — SURVEY.md §7.5 #4: unsigned
    * ranges are enforced by constraint, not type).
    */
  def violations(ds: Dataset[Ranking]): Dataset[Ranking] =
    ds.filter(r => r.rank.exists(x => x < 1 || x > 100) ||
      r.volume < 0 || r.cpc < 0)

  /** Typed grouped aggregate: top volume per domain. */
  def maxVolumeByDomain(ds: Dataset[Ranking]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.domain)
      .mapValues(_.volume)
      .reduceGroups((a, b) => math.max(a, b))
      .toDF("domain", "max_volume")
  }
}
