package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Welch two-sample t-test — ClickHouse `welchTTest` parity: the
  * continuous-measure drift gate beside X93's χ² (categorical). Per key,
  * tests whether sample A (grp = 0) and sample B (grp = 1) of an integer
  * measure share a mean, WITHOUT assuming equal variances (the realistic
  * A/B readout on an events warehouse: the windows differ in size and
  * spread).
  *
  * Exactness discipline (the reason the declared q222 carries a full
  * DuckDB oracle instead of a tolerance band): the corpus-sized pass
  * produces EXACT integer partials per (key, grp) — n as BIGINT, Σx as
  * BIGINT, Σx² as DECIMAL(38,0) (a long Σx² would silently wrap around
  * ~1e9 rows of 5-digit cents; decimal addition is exact and
  * associative, so fold order cannot matter) — and the t statistic is
  * then ONE identical IEEE-754 expression tree over those partials in
  * both engines: same casts, same operator shape, division and sqrt are
  * correctly rounded, so the doubles agree BIT-FOR-BIT given equal
  * partials. No averaging inside the aggregation, no engine-dependent
  * accumulation order anywhere.
  *
  * Scale shape: one corpus-sized partial+final hash agg (all six
  * conditional aggregates ride the same map-side combine — the A23
  * `-If` form); the t/df arithmetic runs on the keys-sized table.
  * Nothing is collected.
  */
object Welch {

  /** Per-`keys` Welch t-test of `x` (integer measure) between grp = 0
    * and grp = 1 rows. Emits n_a/n_b, micro-cent means, the t statistic,
    * the Welch–Satterthwaite degrees of freedom, and a |t| > 1.96 flag
    * (the ~5% two-sided gate). Keys where either sample has < 2 rows are
    * dropped (the variance is undefined there — ClickHouse returns NaN;
    * a declared query needs deterministic rows, so we filter).
    */
  /** The shared exact two-sample partials: per key, (n, Σx, Σx²) for
    * each sample — ONE corpus-sized partial+final agg (six conditional
    * aggregates on one map-side combine); both [[tTest]] and
    * [[studentTTest]] consume this table.
    */
  def partials(rows: DataFrame, keys: Seq[String], grp: String, x: String)
      : DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    val g0 = col(grp) === 0
    rows.groupBy(kc: _*)
      .agg(
        count(when(g0, lit(1))).as("n_a"),
        count(when(!g0, lit(1))).as("n_b"),
        sum(when(g0, col(x))).as("sx_a"),
        sum(when(!g0, col(x))).as("sx_b"),
        sum(when(g0, (col(x) * col(x)).cast(DecimalType(38, 0))))
          .as("sxx_a"),
        sum(when(!g0, (col(x) * col(x)).cast(DecimalType(38, 0))))
          .as("sxx_b"))
      .filter(col("n_a") > 1 && col("n_b") > 1)
  }

  def tTest(rows: DataFrame, keys: Seq[String], grp: String, x: String)
      : DataFrame =
    tTestFromPartials(partials(rows, keys, grp, x), keys)

  /** The keys-sized Welch tail over an already-built partials table —
    * exposed separately because the partials agg is associative
    * (counts/sums/decimal sums fold exactly), so a STREAMING
    * complete-mode agg maintains the same table over micro-batches and
    * this tail turns each snapshot into the live drift readout
    * (`StreamingSpec` A24s pins streamed == batch).
    */
  def tTestFromPartials(p: DataFrame, keys: Seq[String]): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    p.filter(col("n_a") > 1 && col("n_b") > 1)
      // the formula tree below is mirrored TEXTUALLY by Welch.oracleTail
      // (the DuckDB side) — identical ops over identical exact partials
      // give bit-identical doubles; keep the two in lockstep
      .withColumn("ma", expr(
        "CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)"))
      .withColumn("mb", expr(
        "CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)"))
      .withColumn("va", expr(
        "(CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * ma) / " +
          "CAST(n_a - 1 AS DOUBLE)"))
      .withColumn("vb", expr(
        "(CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * mb) / " +
          "CAST(n_b - 1 AS DOUBLE)"))
      // both samples constant => se_a + se_b = 0 => t/df NaN; drop the
      // degenerate keys (the RankTests sigma2 > 0 gate) — both engines
      // decide va + vb > 0 on the same bit-identical doubles
      .filter(expr("va + vb > 0"))
      .withColumn("se_a", expr("va / CAST(n_a AS DOUBLE)"))
      .withColumn("se_b", expr("vb / CAST(n_b AS DOUBLE)"))
      .withColumn("t_stat", expr("(ma - mb) / sqrt(se_a + se_b)"))
      .withColumn("df_w", expr(
        "((se_a + se_b) * (se_a + se_b)) / " +
          "(se_a * se_a / CAST(n_a - 1 AS DOUBLE) + " +
          "se_b * se_b / CAST(n_b - 1 AS DOUBLE))"))
      .withColumn("shifted",
        expr("CAST(CASE WHEN abs(t_stat) > 1.96 THEN 1 ELSE 0 END AS INT)"))
      .select(kc ++ Seq(col("n_a"), col("n_b"), col("t_stat"),
        col("df_w"), col("shifted")): _*)
  }

  /** DuckDB rendition of the t/df formula over a relation `p` carrying
    * the same exact partials (n_a, n_b, sx_a, sx_b, sxx_a, sxx_b) —
    * textually the same expression tree as [[tTest]]'s columns.
    */
  def oracleTail(keyCols: String): String =
    s"""m AS (
       |  SELECT *,
       |    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
       |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb
       |  FROM p WHERE n_a > 1 AND n_b > 1),
       |v AS (
       |  SELECT *,
       |    (CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * ma)
       |      / CAST(n_a - 1 AS DOUBLE) AS va,
       |    (CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * mb)
       |      / CAST(n_b - 1 AS DOUBLE) AS vb
       |  FROM m),
       |se AS (
       |  SELECT *, va / CAST(n_a AS DOUBLE) AS se_a,
       |    vb / CAST(n_b AS DOUBLE) AS se_b
       |  FROM v WHERE va + vb > 0)
       |SELECT $keyCols, n_a, n_b,
       |  (ma - mb) / sqrt(se_a + se_b) AS t_stat,
       |  ((se_a + se_b) * (se_a + se_b)) /
       |    (se_a * se_a / CAST(n_a - 1 AS DOUBLE) +
       |     se_b * se_b / CAST(n_b - 1 AS DOUBLE)) AS df_w,
       |  CAST(CASE WHEN abs((ma - mb) / sqrt(se_a + se_b)) > 1.96
       |    THEN 1 ELSE 0 END AS INT) AS shifted
       |FROM se""".stripMargin

  /** Student's pooled-variance t-test — ClickHouse `studentTTest`: the
    * equal-variance twin of [[tTest]], consuming the SAME exact partials
    * (the classical form when both windows draw from one variance
    * regime). sp² = ((n_a−1)·va + (n_b−1)·vb) / (n_a+n_b−2);
    * t = (ma−mb) / (sp·sqrt(1/n_a + 1/n_b)); df = n_a+n_b−2 — an exact
    * BIGINT, unlike Welch's fractional Satterthwaite df. Same
    * bit-identical IEEE-tree contract as [[tTest]] ([[studentOracleTail]]
    * is the textual mirror).
    */
  def studentTTest(rows: DataFrame, keys: Seq[String], grp: String,
      x: String): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    partials(rows, keys, grp, x)
      .withColumn("ma", expr(
        "CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)"))
      .withColumn("mb", expr(
        "CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)"))
      .withColumn("va", expr(
        "(CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * ma) / " +
          "CAST(n_a - 1 AS DOUBLE)"))
      .withColumn("vb", expr(
        "(CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * mb) / " +
          "CAST(n_b - 1 AS DOUBLE)"))
      .withColumn("sp2", expr(
        "(CAST(n_a - 1 AS DOUBLE) * va + CAST(n_b - 1 AS DOUBLE) * vb)" +
          " / CAST(n_a + n_b - 2 AS DOUBLE)"))
      // pooled variance 0 (both samples constant) => t NaN; drop — same
      // bit-identical-double decision on both sides
      .filter(expr("sp2 > 0"))
      .withColumn("t_stat", expr(
        "(ma - mb) / sqrt(sp2 * (1.0 / CAST(n_a AS DOUBLE) + " +
          "1.0 / CAST(n_b AS DOUBLE)))"))
      .withColumn("df_s", expr("n_a + n_b - 2"))
      .withColumn("shifted",
        expr("CAST(CASE WHEN abs(t_stat) > 1.96 THEN 1 ELSE 0 END AS INT)"))
      .select(kc ++ Seq(col("n_a"), col("n_b"), col("t_stat"),
        col("df_s"), col("shifted")): _*)
  }

  /** Mean z-test with KNOWN population variances — ClickHouse
    * `meanZTest(pop_var_x, pop_var_y, ...)` parity: when the variance of
    * each window is a known constant (a calibrated metric, a monitored
    * stream with an established noise floor), the mean comparison needs
    * no variance estimate and the statistic is exactly normal:
    * z = (m̄_a − m̄_b) / sqrt(σ²_a/n_a + σ²_b/n_b).
    *
    * Rides [[partials]] verbatim (the Σx² column is simply unused — the
    * partials table is the ONE corpus agg the whole test family shares);
    * the variances arrive as LITERAL STRINGS (e.g. "1000000000.0") so
    * the Spark expr and the oracle SQL stay in textual lockstep — the
    * same IEEE-tree contract as [[tTest]] ([[zOracleTail]] mirrors).
    * Known variances must be positive, so no degenerate-key filter is
    * needed beyond the n > 1 partials gate.
    */
  def meanZTest(rows: DataFrame, keys: Seq[String], grp: String, x: String,
      varA: String, varB: String): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    partials(rows, keys, grp, x)
      .withColumn("ma", expr(
        "CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)"))
      .withColumn("mb", expr(
        "CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)"))
      .withColumn("z_stat", expr(
        s"(ma - mb) / sqrt($varA / CAST(n_a AS DOUBLE) + " +
          s"$varB / CAST(n_b AS DOUBLE))"))
      .withColumn("shifted",
        expr("CAST(CASE WHEN abs(z_stat) > 1.96 THEN 1 ELSE 0 END AS INT)"))
      .select(kc ++ Seq(col("n_a"), col("n_b"), col("z_stat"),
        col("shifted")): _*)
  }

  /** DuckDB rendition of the known-variance z form over the same `p`
    * partials relation — the textual mirror of [[meanZTest]].
    */
  def zOracleTail(keyCols: String, varA: String, varB: String): String =
    s"""m AS (
       |  SELECT *,
       |    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
       |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb
       |  FROM p WHERE n_a > 1 AND n_b > 1),
       |z AS (
       |  SELECT *,
       |    (ma - mb) / sqrt($varA / CAST(n_a AS DOUBLE) +
       |      $varB / CAST(n_b AS DOUBLE)) AS z_stat
       |  FROM m)
       |SELECT $keyCols, n_a, n_b, z_stat,
       |  CAST(CASE WHEN abs(z_stat) > 1.96 THEN 1 ELSE 0 END AS INT)
       |    AS shifted
       |FROM z""".stripMargin

  /** DuckDB rendition of the Student pooled form over the same `p`
    * partials relation — the textual mirror of [[studentTTest]].
    */
  def studentOracleTail(keyCols: String): String =
    s"""m AS (
       |  SELECT *,
       |    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
       |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb
       |  FROM p WHERE n_a > 1 AND n_b > 1),
       |v AS (
       |  SELECT *,
       |    (CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * ma)
       |      / CAST(n_a - 1 AS DOUBLE) AS va,
       |    (CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * mb)
       |      / CAST(n_b - 1 AS DOUBLE) AS vb
       |  FROM m),
       |sp AS (
       |  SELECT *,
       |    (CAST(n_a - 1 AS DOUBLE) * va + CAST(n_b - 1 AS DOUBLE) * vb)
       |      / CAST(n_a + n_b - 2 AS DOUBLE) AS sp2
       |  FROM v)
       |SELECT $keyCols, n_a, n_b,
       |  (ma - mb) / sqrt(sp2 * (1.0 / CAST(n_a AS DOUBLE) +
       |    1.0 / CAST(n_b AS DOUBLE))) AS t_stat,
       |  CAST(n_a + n_b - 2 AS BIGINT) AS df_s,
       |  CAST(CASE WHEN abs((ma - mb) / sqrt(sp2 *
       |    (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
       |    > 1.96 THEN 1 ELSE 0 END AS INT) AS shifted
       |FROM sp WHERE sp2 > 0""".stripMargin
}
