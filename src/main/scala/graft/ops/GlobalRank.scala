package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed per-group global ranking — the building block for exact
  * order statistics (percentiles, medians, top-rank selection) without
  * buffering a group's values in one reducer.
  *
  * Spark's exact `percentile()` is a TypedImperative aggregate: every value
  * of a group is buffered and shipped to that group's single final reducer
  * — with a 3-value group key that is the whole fact table in 3 tasks, tens
  * of GB per reducer at 100 TB (VERDICT r02 flagged q63 as the one
  * remaining scale-killer). The scale-safe form is the q33 technique, per
  * group: range-partition by (group, value) so each task owns a contiguous
  * slice of one-or-more groups' value ranges, sort within partitions, then
  * derive each row's global rank within its group from lazily-computed
  * per-(partition, group) counts. No window, no collect, no single-task
  * stage; the only driver-side work is the range exchange's bounds
  * sampling.
  *
  * Reference behavior replicated: ClickHouse `quantileExact*` /
  * `medianExact` family (the reference's OLAP store exposes exact
  * quantiles; see SURVEY.md §2.4 A10).
  */
object GlobalRank {

  /** Ascending 0-based rank of every row's `value` within its `group`.
    *
    * Returns `(g string, v double, rank long)`. Group values must be
    * non-null (cast to string internally); ties get distinct consecutive
    * ranks in arbitrary order, which is exactly what order statistics
    * need (equal values make interpolation tie-insensitive).
    *
    * Both derived branches (per-partition-per-group counts; per-row local
    * indices) hang off ONE sorted RDD instance, so the range exchange's
    * sampled bounds and map stage are shared by construction — correctness
    * does not depend on ReuseExchange firing. Cumulative offsets come from
    * a non-equi self-join of the tiny (numPartitions × numGroups)-row
    * counts table, broadcast back onto the rows.
    */
  def perGroupRank(df: DataFrame, group: Column, value: Column): DataFrame =
    rankedWithCounts(df, group, value)._1

  /** (ranked rows, per-(pid, group) counts) — counts exposed so callers
    * needing per-group totals can aggregate the tiny counts table instead
    * of re-traversing the ranked fact rows. */
  private def rankedWithCounts(
      df: DataFrame,
      group: Column,
      value: Column): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val sortedRdd = df
      .select(group.cast("string").as("g"), value.cast("double").as("v"))
      .repartitionByRange(col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .rdd // lazy DAG; eager part = range-bounds sampling only
    val countsRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      // groups are contiguous after the sort; keep insertion order so
      // the few (group, count) pairs per partition stay cheap
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r => val g = r.getString(0); m(g) = m.getOrElse(g, 0L) + 1 }
      m.iterator.map { case (g, c) => (pid, g, c) }
    }.cache() // numPartitions×numGroups rows. Several downstream subtrees
    // (offsets; per-group totals) each execute this branch; without the
    // cache each one re-runs a full sorted reduce pass over the data.
    // Lifecycle: ContextCleaner auto-unpersists once the query's RDDs are
    // unreferenced, so builder-scoped caching doesn't accumulate.
    val counts = spark.createDataFrame(countsRdd).toDF("pid", "g", "cnt")
    val offsets = counts.as("a")
      .join(counts.as("b"),
        col("a.g") === col("b.g") && col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"), col("a.g").as("g"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("offset"))
    val local = spark.createDataFrame(
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        var curG: String = null
        var i = -1L
        it.map { r =>
          val g = r.getString(0)
          if (g != curG) { curG = g; i = 0L } else i += 1
          (pid, g, i, r.getDouble(1))
        }
      }).toDF("pid", "g", "local_idx", "v")
    val ranked = local.join(broadcast(offsets), Seq("pid", "g"))
      .select(col("g"), col("v"), (col("offset") + col("local_idx")).as("rank"))
    (ranked, counts)
  }

  /** Exact linear-interpolated percentiles per group, distributed.
    *
    * `percentages` may be ANY decimal literals, including inexactly
    * representable ones (0.9, 0.99): both engines parse the same literal
    * to the identical IEEE double, compute the identical
    * `pos = q·(n−1)` product, and apply the identical interpolation, so
    * no exact-representability precondition is needed. The weighted form
    * `(hi − pos)·v_lo + (pos − lo)·v_hi` replicates Spark's
    * `Percentile.getPercentile` AND is bit-for-bit what DuckDB's
    * `quantile_cont` computes — verified empirically against DuckDB over
    * 16 413 random non-tie integer-value cells with
    * q ∈ {0.5, 0.75, 0.9, 0.95, 0.99} (0 mismatches; the lerp form
    * `v_lo + (pos−lo)·(v_hi−v_lo)` mismatched 2 512 of them, so the FORM
    * is load-bearing — do not "simplify" it). Returns
    * `(g string, q double, pct double)` — one row per group × percentage.
    * One strengthening over Spark's form: when v_lo == v_hi the exact
    * value is returned directly instead of through the weighted form,
    * which can land 1 ulp low — see the in-line note. Results are
    * hash-identical to the single-reducer aggregate they replace EXCEPT
    * in that v_lo == v_hi case, where the exact value is returned instead
    * of Percentile's occasionally-1-ulp-low weighted result (matching
    * DuckDB, which also returns the exact value there).
    *
    * Cost at scale: one full shuffle of (group, value) pairs — narrow, two
    * columns — plus two reduce passes over it and tiny broadcast joins.
    * Compare: the TypedImperative form shuffles the same pairs but then
    * concentrates each group on ONE reducer; here every stage is parallel.
    */
  def exactPercentiles(
      df: DataFrame,
      group: Column,
      value: Column,
      percentages: Seq[Double]): DataFrame = {
    val (ranked, counts) = rankedWithCounts(df, group, value)
    // totals per group → target ranks lo=floor(q·(n−1)), hi=ceil(q·(n−1));
    // aggregated from the tiny counts table, not the ranked fact rows
    val totals = counts.groupBy("g").agg(sum("cnt").as("n"))
    val targets = totals
      .select(col("g"), col("n"),
        explode(array(percentages.map(lit(_)): _*)).as("q"))
      .withColumn("pos", col("q") * (col("n") - lit(1L)))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("hi", ceil(col("pos")).cast("long"))
    val needed = targets
      .select(col("g"), col("q"), col("pos"), col("lo"), col("hi"),
        explode(array(col("lo"), col("hi"))).as("rank"))
    ranked.join(broadcast(needed), Seq("g", "rank"))
      .groupBy("g", "q")
      .agg(first("pos").as("pos"), first("lo").as("lo"), first("hi").as("hi"),
        max(when(col("rank") === col("lo"), col("v"))).as("vlo"),
        max(when(col("rank") === col("hi"), col("v"))).as("vhi"))
      .withColumn("pct",
        // vlo == vhi short-circuit: the weighted form (hi−pos)·v +
        // (pos−lo)·v is 1 ulp BELOW v for some (pos, v) even though the
        // weights sum to 1 exactly — and DuckDB's quantile_cont returns
        // v exactly in that case (common for discrete values), so any
        // downstream floor/quantization straddling the boundary would
        // diverge cross-engine. Both engines return exactly v here.
        when(col("lo") === col("hi") || col("vlo") === col("vhi"),
            col("vlo"))
          .otherwise((col("hi") - col("pos")) * col("vlo") +
            (col("pos") - col("lo")) * col("vhi")))
      .select("g", "q", "pct")
  }

  /** Exact WEIGHTED quantiles per group, distributed — ClickHouse
    * `quantileExactWeighted` parity (the reference's engine ships weighted
    * quantiles first-class; unweighted exact is [[exactPercentiles]]).
    *
    * Semantics (discrete / type-1, the cross-engine-exact form): for each
    * group with total weight W and level q (as integer ppm), the SMALLEST
    * value v whose inclusive cumulative weight reaches the level:
    * `cumW(≤ v) · 1e6 ≥ q_ppm · W`. All-integer — no float level math, so
    * DuckDB replays it bit-identically via a window cumulative sum. The
    * result is invariant to tie order among equal values: the qualifying
    * set is a suffix of the value order, and whether ANY row of value v
    * qualifies depends only on W(≤ v) (the last tie row carries it), so
    * `min(v)` is well-defined under both row- and range-framed cumsums.
    * Weight-k rows behave exactly like k repeated rows (spec-pinned).
    *
    * Scale shape — the [[perGroupRank]] machinery with weights: ONE range
    * exchange of narrow (g, v, w) triples, per-(partition, group) weight
    * sums cumulated through the tiny non-equi self-join, within-partition
    * running sums, then a broadcast (group × level) target join + filter +
    * min agg. No window over the fact rows, no single-reducer group
    * buffering, every stage parallel. Comparisons run in DECIMAL:
    * cumW·1e6 and q_ppm·W both reach ~1e19 at 100 TB token weights, past
    * long range (DuckDB's HUGEINT sums are safe by default; the Spark
    * side must widen explicitly).
    *
    * Returns `(g string, q_ppm int, wq double)` — one row per group ×
    * level. Weights must be non-negative longs.
    */
  def weightedQuantiles(
      df: DataFrame,
      group: Column,
      value: Column,
      weight: Column,
      qPpms: Seq[Int]): DataFrame = {
    val spark = df.sparkSession
    // r16 (guide §2.3): weight-k rows behave exactly like k repeated rows
    // (spec-pinned), so equal (g, v) rows collapse to one row summing the
    // weights before the range exchange — a map-side-combinable agg; the
    // cumulative-weight threshold test is unchanged on the contracted
    // table (callers pass bounded value domains — q202's doc lengths —
    // where the contraction is large; for near-unique values use
    // exactPercentiles' per-row machinery instead).
    val sortedRdd = df
      .select(group.cast("string").as("g"), value.cast("double").as("v"),
        weight.cast("long").as("w"))
      .groupBy("g", "v").agg(sum("w").as("w"))
      .repartitionByRange(col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .rdd // lazy DAG; eager part = range-bounds sampling only
    val wsumsRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        val g = r.getString(0); m(g) = m.getOrElse(g, 0L) + r.getLong(2)
      }
      m.iterator.map { case (g, s) => (pid, g, s) }
    }.cache() // numPartitions×numGroups rows; lifecycle as rankedWithCounts
    val wsums = spark.createDataFrame(wsumsRdd).toDF("pid", "g", "wsum")
    val offsets = wsums.as("a")
      .join(wsums.as("b"),
        col("a.g") === col("b.g") && col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"), col("a.g").as("g"))
      .agg(coalesce(sum(col("b.wsum")), lit(0L)).as("offset"))
    val local = spark.createDataFrame(
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        var curG: String = null
        var run = 0L
        it.map { r =>
          val g = r.getString(0)
          if (g != curG) { curG = g; run = 0L }
          run += r.getLong(2)
          (pid, g, r.getDouble(1), run) // inclusive cum within (pid, g)
        }
      }).toDF("pid", "g", "v", "local_cum")
    val rows = local.join(broadcast(offsets), Seq("pid", "g"))
      .select(col("g"), col("v"),
        (col("offset") + col("local_cum")).as("cum_w"))
    val totals = wsums.groupBy("g").agg(sum("wsum").as("wt"))
    val targets = totals.select(col("g"), col("wt"),
      explode(array(qPpms.map(lit(_)): _*)).as("q_ppm"))
    rows.join(broadcast(targets), Seq("g"))
      .filter(col("cum_w").cast("decimal(20,0)") * lit(1000000L) >=
        col("q_ppm").cast("decimal(7,0)") * col("wt").cast("decimal(20,0)"))
      .groupBy("g", "q_ppm")
      .agg(min("v").as("wq"))
  }

  /** Distributed exclusive prefix sum over a total order — the q33/q63
    * machinery with SUMS instead of COUNTS: range-partition by `order`,
    * lazily derive per-partition value sums, cumulate them through the
    * tiny non-equi self-join, and add each row's within-partition running
    * sum. Returns `(k long, v long, cum_before long)` where `cum_before`
    * is the sum of `v` over all rows strictly before `k` in ascending
    * order. No window, no collect, every stage parallel — this is the
    * primitive behind token-budget context packing (q86), byte-budget
    * shard cutting, and any "running total over a 100 TB order".
    * `order` values must be unique (they define the total order).
    */
  def prefixSum(df: DataFrame, order: Column, value: Column): DataFrame = {
    val spark = df.sparkSession
    val sortedRdd = df
      .select(order.cast("long").as("k"), value.cast("long").as("v"))
      .repartitionByRange(col("k"))
      .sortWithinPartitions("k")
      .rdd // lazy DAG; eager part = range-bounds sampling only
    val sumsRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator.single((pid, s))
    }.cache() // numPartitions rows; see rankedWithCounts for lifecycle
    val sums = spark.createDataFrame(sumsRdd).toDF("pid", "psum")
    val offsets = sums.as("a")
      .join(sums.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.psum")), lit(0L)).as("offset"))
    val local = spark.createDataFrame(
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        var run = 0L
        it.map { r =>
          val before = run
          run += r.getLong(1)
          (pid, r.getLong(0), r.getLong(1), before)
        }
      }).toDF("pid", "k", "v", "local_before")
    local.join(broadcast(offsets), Seq("pid"))
      .select(col("k"), col("v"),
        (col("offset") + col("local_before")).as("cum_before"))
  }
}
