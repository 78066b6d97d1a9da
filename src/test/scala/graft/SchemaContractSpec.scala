package graft

import org.apache.spark.sql.types._

/** Canary for the driver-testdata logical schemas (round-8 lesson: the
  * driver regenerated `/root/testdata` mid-round and silently switched
  * `events.ts` from timestamp[ns] to timestamp[us], surfacing as 16
  * analysis errors scattered across the time tier). This spec pins the
  * POST-READ schema of every table — the contract the 133-query registry
  * is written against — so the next physical-encoding change fails HERE,
  * in one place, with the drifted column named, instead of as cryptic
  * per-query failures.
  *
  * `events` is asserted after `Tables.events` normalization (ts → epoch-ns
  * LongType — the engine's canonical form; the physical-encoding variants
  * themselves are covered by `TablesSpec`).
  */
class SchemaContractSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq( // post-Tables.events normalization
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  expected.foreach { case (table, cols) =>
    test(s"$table post-read schema matches the registry's contract") {
      val df =
        if (table == "events") Tables.events(spark, sf)
        else Tables.t(spark, sf, table)
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      assert(actual == cols,
        s"$table schema drifted (driver regeneration?):\n" +
          s"  expected: $cols\n  actual:   $actual\n" +
          "If the new shape is intentional, update this contract AND " +
          "re-verify every query touching the drifted columns " +
          "(see TablesSpec / VERDICT r7 for the events.ts precedent).")
    }
  }
}
