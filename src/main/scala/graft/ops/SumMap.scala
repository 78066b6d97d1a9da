package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sumMap — ClickHouse `sumMap` parity: per group, the elementwise sum of
  * a map-valued column (rows carry maps with POSSIBLY DIFFERENT key sets;
  * the group's result maps every key that occurs to the sum of its values
  * across the group's rows). ClickHouse uses it for per-key measure
  * vectors — metrics maps, per-code counters — where the key set is data,
  * not schema.
  *
  * Spark-first form: NOT a custom aggregator — the map surface composes
  * from codegen'd built-ins (the preference-(a) tier):
  * explode(map) → (keys, k) partial+final sum → one re-assembly agg via
  * map_from_entries over the entry list sorted by key. The sort makes the
  * output key order DETERMINISTIC (map equality/hashing across engines
  * needs a canonical order; ClickHouse sumMap likewise returns
  * key-sorted arrays), and array_sort on (k, v) structs is a total order
  * because k is unique after the sum.
  *
  * Scale shape: the explode multiplies rows by entries-per-map (bounded
  * by the metric vocabulary, not the corpus); the heavy agg is the
  * (group, k) sum — map-side combinable, shuffle rows = groups × distinct
  * keys. The re-assembly agg re-shuffles on the group prefix, but its
  * input is the ALREADY-AGGREGATED groups×keys table (≪ corpus — the
  * corpus is exchanged exactly once). Nothing is collected.
  */
object SumMap {

  /** Elementwise-sum `mapCol` (MapType(_, summable)) per `keys` group.
    * Output: `keys :+ mapCol`, entries key-sorted.
    */
  def sumMap(df: DataFrame, keys: Seq[String], mapCol: String): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    val exploded = df.select(kc :+ explode(col(mapCol)).as(Seq("k", "v")): _*)
    exploded
      .groupBy(kc :+ col("k"): _*)
      .agg(sum("v").as("v"))
      .groupBy(kc: _*)
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("k"), col("v")))))
        .as(mapCol))
  }

  /** avgMap — per group and key, the fixed-point mean of the map values
    * over the rows where the key occurs: `(scale·Σv) DIV count`, integer
    * micro-units by default so the result is cross-engine exact (double
    * division would be IEEE-identical too, but the repo's fixed-point
    * discipline keeps every declared aggregate replayable as integer
    * SQL). Same shape as [[sumMap]] — the count is one extra column on
    * the SAME (group, k) agg, so avgMap costs exactly what sumMap costs.
    * Domain contract: non-negative values (Spark `DIV` truncates toward
    * zero, DuckDB `//` floors — equivalent only on ≥ 0; the
    * Scalars.cents contract). Exactness window: the caller picks `scale`
    * so scale·Σv stays under 2^63 PER (group, key) — per-key sums are
    * group-partitioned slices, so the default 1e6 holds to ~9.2e12 per
    * cell; never feed a fact-table grand total through a pre-scaled
    * division (q221's avg note / q209's guard rationale).
    */
  def avgMap(df: DataFrame, keys: Seq[String], mapCol: String,
      scale: Long = 1000000L): DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    df.select(kc :+ explode(col(mapCol)).as(Seq("k", "v")): _*)
      .groupBy(kc :+ col("k"): _*)
      .agg(expr(s"(${scale}L * sum(v)) DIV count(1)").as("v"))
      .groupBy(kc: _*)
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("k"), col("v")))))
        .as(mapCol))
  }

  /** Driver-comparable rendering of a key-sorted map column: one VARCHAR
    * `k=v,...` cell (the q34_parse_array `arr_str` convention — the
    * driver's pandas comparator cannot sort nested types, so declared
    * queries emit THIS instead of the raw map; DuckDB replays it as
    * `string_agg(k || '=' || v, ',' ORDER BY k)`). Entry order is the
    * assembly order — [[sumMap]]/[[minMaxMap]]/[[avgMap]] build from the
    * key-sorted entry array, and Spark maps preserve insertion order.
    * The transform lambda is interpreted (ArrayTransform is
    * CodegenFallback): render AGGREGATED outputs only, never a corpus.
    */
  def renderEntries(mapCol: Column): Column =
    array_join(
      transform(map_entries(mapCol),
        e => concat(e.getField("key"), lit("="),
          e.getField("value").cast("string"))),
      ",")

  /** minMap + maxMap (the rest of ClickHouse's map-combinator family) in
    * ONE pass: per group, the elementwise min AND max of the map values
    * over every key that occurs — same explode → (group, key) partial+
    * final agg shape as [[sumMap]] with min/max folds, both maps
    * assembled in the same re-assembly agg (one exchange over the
    * already-aggregated groups×keys table serves both outputs). An
    * ABSENT key contributes nothing — min/max range over the rows where
    * the key occurs, the ClickHouse semantics (keys are data; a missing
    * metric is missing, not zero).
    */
  def minMaxMap(df: DataFrame, keys: Seq[String], mapCol: String)
      : DataFrame = {
    val kc: Seq[Column] = keys.map(col)
    df.select(kc :+ explode(col(mapCol)).as(Seq("k", "v")): _*)
      .groupBy(kc :+ col("k"): _*)
      .agg(min("v").as("vmin"), max("v").as("vmax"))
      .groupBy(kc: _*)
      .agg(
        map_from_entries(
          array_sort(collect_list(struct(col("k"), col("vmin")))))
          .as(s"${mapCol}_min"),
        map_from_entries(
          array_sort(collect_list(struct(col("k"), col("vmax")))))
          .as(s"${mapCol}_max"))
  }
}
