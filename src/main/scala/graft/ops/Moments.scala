package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Higher-moment aggregates — ClickHouse `skewPop` / `kurtPop` parity:
  * population skewness m₃/m₂^1.5 and kurtosis m₄/m₂² of an integer
  * measure per group (the distribution-SHAPE summary beside q62's
  * stddev/corr tier — is the value distribution lopsided, are its tails
  * heavy — the readout that decides whether mean-based gates like A24
  * are even appropriate).
  *
  * Exactness discipline (the Welch contract): the corpus pass folds
  * EXACT power sums — n BIGINT, Σx BIGINT, Σx² DECIMAL(38,0), Σx³ and
  * Σx⁴ DECIMAL(38,0) with the per-row powers built by DECIMAL
  * multiplication (x⁴ of 5-digit cents already exceeds a long PER ROW;
  * decimal (38,0) holds it to x < ~10⁹ with the sum widening exact) —
  * then the central moments and ratios are ONE identical IEEE tree over
  * those partials in both engines: bit-identical doubles, full oracle.
  * The > 2⁵³ power sums convert to double THROUGH THEIR EXACT DIGIT
  * STRING on both sides (string→double is correctly rounded everywhere;
  * Spark's direct Decimal→Double is only within-1-ulp, which flipped
  * kurtosis by 2 ulp on first landing — the only conversion in the repo
  * where a partial exceeds 2⁵³).
  *
  * m₂ = Σx²/n − μ²; m₃ = Σx³/n − 3μΣx²/n + 2μ³;
  * m₄ = Σx⁴/n − 4μΣx³/n + 6μ²Σx²/n − 3μ⁴  (μ = Σx/n).
  *
  * Scale shape: one partial+final hash agg (decimal sums merge
  * exactly, map-side combinable); the moment algebra runs on the
  * keys-sized table. Degenerate groups (n < 2 or zero variance) are
  * filtered — both engines decide m₂ > 0 on the same bit-identical
  * double.
  */
object Moments {

  def skewKurt(rows: DataFrame, keys: Seq[String], x: String): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    // |x| >= ~1e9 overflows the DECIMAL(38,0) x^4 per-row power, which
    // in non-ANSI Spark NULLs silently while DuckDB's HUGEINT raises —
    // enforce the documented window loudly PER ROW (the q209/Association
    // guard pattern: assert_true folded in as a +0 term)
    val xg = col(x) + coalesce(
      assert_true(abs(col(x)) < lit(1000000000L),
        lit("Moments.skewKurt: |x| >= 1e9 overflows the DECIMAL(38,0) " +
          "x^4 per-row power — rescale the measure or widen the fold"))
        .cast("long"), lit(0L))
    val xd = xg.cast(DecimalType(38, 0))
    val x2 = (xg * xg).cast(DecimalType(38, 0))
    rows.groupBy(kc: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xg).as("sx"),
        sum(x2).as("sx2"),
        sum((x2 * xd).cast(DecimalType(38, 0))).as("sx3"),
        sum((x2 * x2).cast(DecimalType(38, 0))).as("sx4"))
      .filter(col("n") > 1)
      // IEEE tail mirrored textually by oracleTail — keep in lockstep
      .withColumn("mu", expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("m2", expr(
        "CAST(CAST(sx2 AS STRING) AS DOUBLE) / CAST(n AS DOUBLE) - mu * mu"))
      .filter(col("m2") > 0)
      .withColumn("m3", expr(
        "CAST(CAST(sx3 AS STRING) AS DOUBLE) / CAST(n AS DOUBLE) - " +
          "3.0 * mu * (CAST(CAST(sx2 AS STRING) AS DOUBLE) / CAST(n AS DOUBLE)) + " +
          "2.0 * mu * mu * mu"))
      .withColumn("m4", expr(
        "CAST(CAST(sx4 AS STRING) AS DOUBLE) / CAST(n AS DOUBLE) - " +
          "4.0 * mu * (CAST(CAST(sx3 AS STRING) AS DOUBLE) / CAST(n AS DOUBLE)) + " +
          "6.0 * mu * mu * (CAST(CAST(sx2 AS STRING) AS DOUBLE) / CAST(n AS DOUBLE)) - " +
          "3.0 * mu * mu * mu * mu"))
      .withColumn("skew_pop", expr("m3 / (sqrt(m2) * m2)"))
      .withColumn("kurt_pop", expr("m4 / (m2 * m2)"))
      .select(kc ++ Seq(col("n"), col("skew_pop"), col("kurt_pop")): _*)
  }

  /** DuckDB rendition over a CTE `p(key..., n, sx, sx2, sx3, sx4)` —
    * the textual mirror of [[skewKurt]]'s tail.
    */
  def oracleTail(keyCols: String): String =
    s"""m AS (
       |  SELECT *, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu
       |  FROM p WHERE n > 1),
       |c AS (
       |  SELECT *,
       |    CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) - mu * mu AS m2,
       |    CAST(CAST(sx3 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) -
       |      3.0 * mu * (CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) +
       |      2.0 * mu * mu * mu AS m3,
       |    CAST(CAST(sx4 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) -
       |      4.0 * mu * (CAST(CAST(sx3 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) +
       |      6.0 * mu * mu * (CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) -
       |      3.0 * mu * mu * mu * mu AS m4
       |  FROM m)
       |SELECT $keyCols, n,
       |  m3 / (sqrt(m2) * m2) AS skew_pop,
       |  m4 / (m2 * m2) AS kurt_pop
       |FROM c WHERE m2 > 0""".stripMargin
}
