package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-based two-sample tests — ClickHouse `mannWhitneyUTest` /
  * `kolmogorovSmirnovTest` parity: the DISTRIBUTION-shift complements of
  * the mean-shift gates (ops/Welch): MWU detects a stochastic ordering
  * shift without normality assumptions; KS detects ANY CDF divergence
  * (shape, spread, location). Together with Welch/Student (A24/A26) and
  * χ² (X93) they complete the drift-gate family a warehouse runs over
  * its A/B windows.
  *
  * Exactness discipline (full DuckDB oracles, no tolerance bands):
  * both tests reduce to integer-exact statistics over the per-key VALUE
  * HISTOGRAM — (key, x, count_a, count_b) — because ranks and ECDFs are
  * functions of counts alone:
  *  - MWU: with ties averaged, 2·rank(x) = 2·(#below) + (#tied) + 1 is
  *    an INTEGER, so 2·R_a (and hence 2·U_a) is exact BIGINT; the tie
  *    correction Σ(t³−t) folds exactly in DECIMAL(38,0) with a loud
  *    per-value t < 2²¹ guard (t³ must fit a long before the decimal
  *    sum — silent wrap would corrupt σ invisibly).
  *  - KS: D = max |cdf_a − cdf_b| = max |cum_a·n_b − cum_b·n_a| / (n_a·n_b)
  *    — an exact BIGINT numerator over a shared denominator.
  *  The z / threshold arithmetic is then one identical IEEE tree over
  *  those integers in both engines (the Welch contract): bit-identical
  *  doubles, full hash oracle.
  *
  * Scale shape: ONE corpus-sized partial+final agg builds the histogram;
  * every window below runs PER-KEY over the histogram table, whose size
  * is keys × distinct values — bounded by the value domain (cents of a
  * bounded measure), NOT the corpus; it saturates under data growth.
  * No global-order window ever touches fact rows (§7.5 #7).
  */
object RankTests {

  /** Per-(keys, x) sample counts: the shared reduction both tests run
    * from. One corpus agg, map-side combinable.
    */
  def histogram(rows: DataFrame, keys: Seq[String], grp: String, x: String)
      : DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    val g0 = col(grp) === 0
    rows.groupBy(kc :+ col(x).as("x"): _*)
      .agg(
        count(when(g0, lit(1))).as("c_a"),
        count(when(!g0, lit(1))).as("c_b"))
  }

  /** Mann–Whitney U (normal approximation with tie-corrected σ, the
    * ClickHouse form). Emits the exact doubled statistic `u2_a` = 2·U_a
    * (integer even under tie-averaged ranks), the z score, and a
    * |z| > 1.96 flag. Keys need ≥ 2 rows per sample and a non-degenerate
    * value spread (an all-tied key has σ = 0 and no test).
    */
  def mannWhitney(hist: DataFrame, keys: Seq[String]): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRanks = hist
      .withColumn("t", col("c_a") + col("c_b"))
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("lo", col("cum") - col("t"))
      // t < 2^21 keeps t³ inside a long BEFORE the exact decimal fold;
      // a bigger tie group must error loudly, never wrap silently
      .withColumn("tguard", coalesce(
        assert_true(col("t") < lit(2097152L),
          lit("RankTests.mannWhitney: tie group >= 2^21 would overflow " +
            "t^3 — pre-bucket the measure or widen the tie fold"))
          .cast("long"), lit(0L)))
      .withColumn("r2_contrib",
        col("c_a") * (lit(2L) * col("lo") + col("t") + lit(1L)) +
          col("tguard"))
      .withColumn("tie3",
        (col("t") * col("t") * col("t") - col("t"))
          .cast(DecimalType(38, 0)))
    withRanks.groupBy(kc: _*)
      .agg(
        sum("c_a").as("n_a"),
        sum("c_b").as("n_b"),
        sum("r2_contrib").as("r2_a"),
        sum("tie3").as("tie_sum"))
      .filter(col("n_a") > 1 && col("n_b") > 1)
      // n < 2^31 keeps 2·R_a = O(n²) inside a long (rank sums are
      // inherently quadratic in magnitude; past that, shard the window)
      .withColumn("nguard", coalesce(
        assert_true(col("n_a") + col("n_b") < lit(2147483648L),
          lit("RankTests.mannWhitney: n >= 2^31 overflows the exact " +
            "doubled rank sum — shard the test window"))
          .cast("long"), lit(0L)))
      .withColumn("u2_a",
        col("r2_a") - col("n_a") * (col("n_a") + 1) + col("nguard"))
      // IEEE tail mirrored textually by mwuOracleTail — keep in lockstep
      .withColumn("nd", expr("CAST(n_a + n_b AS DOUBLE)"))
      .withColumn("sigma2", expr(
        "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0) * " +
          "((nd + 1.0) - CAST(tie_sum AS DOUBLE) / (nd * (nd - 1.0)))"))
      .filter(col("sigma2") > 0)
      .withColumn("z_stat", expr(
        "(CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * " +
          "CAST(n_b AS DOUBLE)) / (2.0 * sqrt(sigma2))"))
      .withColumn("shifted",
        expr("CAST(CASE WHEN abs(z_stat) > 1.96 THEN 1 ELSE 0 END AS INT)"))
      .select(kc ++ Seq(col("n_a"), col("n_b"), col("u2_a"),
        col("z_stat"), col("shifted")): _*)
  }

  /** DuckDB rendition of [[mannWhitney]] over a histogram CTE `h`
    * carrying (key, x, c_a, c_b) — windows, integer rank algebra, and
    * the IEEE tail all textually mirrored.
    */
  def mwuOracleTail(key: String): String =
    s"""r AS (
       |  SELECT $key, c_a, c_b, c_a + c_b AS t,
       |    CAST(sum(c_a + c_b) OVER (PARTITION BY $key ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM h),
       |p AS (
       |  SELECT $key,
       |    CAST(sum(c_a) AS BIGINT) AS n_a,
       |    CAST(sum(c_b) AS BIGINT) AS n_b,
       |    CAST(sum(c_a * (2 * (cum - t) + t + 1)) AS BIGINT) AS r2_a,
       |    sum(CAST(t * t * t - t AS DECIMAL(38,0))) AS tie_sum
       |  FROM r GROUP BY 1),
       |u AS (
       |  SELECT *, r2_a - n_a * (n_a + 1) AS u2_a,
       |    CAST(n_a + n_b AS DOUBLE) AS nd
       |  FROM p WHERE n_a > 1 AND n_b > 1),
       |s AS (
       |  SELECT *,
       |    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0) *
       |      ((nd + 1.0) - CAST(tie_sum AS DOUBLE) / (nd * (nd - 1.0)))
       |      AS sigma2
       |  FROM u)
       |SELECT $key, n_a, n_b, u2_a,
       |  (CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) *
       |    CAST(n_b AS DOUBLE)) / (2.0 * sqrt(sigma2)) AS z_stat,
       |  CAST(CASE WHEN abs((CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) *
       |    CAST(n_b AS DOUBLE)) / (2.0 * sqrt(sigma2))) > 1.96
       |    THEN 1 ELSE 0 END AS INT) AS shifted
       |FROM s WHERE sigma2 > 0""".stripMargin

  /** Two-sample Kolmogorov–Smirnov: D = max ECDF gap as the exact
    * integer numerator `d_num` = max |cum_a·n_b − cum_b·n_a| over the
    * shared denominator n_a·n_b, plus d_ppm and the α = 0.05 rejection
    * flag (D > 1.358·sqrt((n_a+n_b)/(n_a·n_b)) — the asymptotic
    * two-sample critical value).
    */
  def ksTest(hist: DataFrame, keys: Seq[String]): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(kc: _*)
    val gaps = hist
      .withColumn("cum_a", sum(col("c_a")).over(w))
      .withColumn("cum_b", sum(col("c_b")).over(w))
      .withColumn("n_a", sum(col("c_a")).over(tot))
      .withColumn("n_b", sum(col("c_b")).over(tot))
      // ppm scaling below needs 1e6·n_a·n_b inside a long; loud guard
      // (q209 pattern) — at that mass, shard the test window
      .withColumn("guard", coalesce(
        assert_true(col("n_a") * col("n_b") < lit(9223372036854L),
          lit("RankTests.ksTest: n_a*n_b >= 2^63/1e6 — ppm scaling " +
            "would overflow; shard the test window"))
          .cast("long"), lit(0L)))
      .withColumn("gap",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")) +
          col("guard"))
    gaps.groupBy(kc: _*)
      .agg(
        max("n_a").as("n_a"), max("n_b").as("n_b"),
        max("gap").as("d_num"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("d_ppm", expr("(1000000 * d_num) DIV (n_a * n_b)"))
      // IEEE tail mirrored textually by ksOracleTail
      .withColumn("drifted", expr(
        "CAST(CASE WHEN CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * " +
          "CAST(n_b AS DOUBLE)) > 1.358 * sqrt((CAST(n_a AS DOUBLE) + " +
          "CAST(n_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) * " +
          "CAST(n_b AS DOUBLE))) THEN 1 ELSE 0 END AS INT)"))
      .select(kc ++ Seq(col("n_a"), col("n_b"), col("d_num"),
        col("d_ppm"), col("drifted")): _*)
  }

  /** DuckDB rendition of [[ksTest]] over the same histogram CTE `h`. */
  def ksOracleTail(key: String): String =
    s"""g AS (
       |  SELECT $key,
       |    CAST(sum(c_a) OVER (PARTITION BY $key ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_a,
       |    CAST(sum(c_b) OVER (PARTITION BY $key ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_b,
       |    CAST(sum(c_a) OVER (PARTITION BY $key) AS BIGINT) AS n_a,
       |    CAST(sum(c_b) OVER (PARTITION BY $key) AS BIGINT) AS n_b
       |  FROM h),
       |p AS (
       |  SELECT $key, max(n_a) AS n_a, max(n_b) AS n_b,
       |    max(abs(cum_a * n_b - cum_b * n_a)) AS d_num
       |  FROM g GROUP BY 1)
       |SELECT $key, n_a, n_b, d_num,
       |  (1000000 * d_num) // (n_a * n_b) AS d_ppm,
       |  CAST(CASE WHEN CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) *
       |    CAST(n_b AS DOUBLE)) > 1.358 * sqrt((CAST(n_a AS DOUBLE) +
       |    CAST(n_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) *
       |    CAST(n_b AS DOUBLE))) THEN 1 ELSE 0 END AS INT) AS drifted
       |FROM p WHERE n_a > 0 AND n_b > 0""".stripMargin
}
