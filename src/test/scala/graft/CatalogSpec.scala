package graft

/** Catalog/meta queries (SURVEY.md §2.1 S11/S12 — the reference's
  * `SHOW TABLES` / `SELECT 1` connectivity surface,
  * `drivers/connection_test.py:23-26`). No-oracle by design.
  */
class CatalogSpec extends SparkSpec {

  test("SELECT 1 healthcheck") {
    assert(spark.sql("SELECT 1").collect().head.getInt(0) == 1)
  }

  test("SHOW TABLES lists registered testdata views") {
    Seq("lineitem", "orders", "customer").foreach { t =>
      Tables.t(spark, sf, t).createOrReplaceTempView(s"cat_$t")
    }
    val names = spark.sql("SHOW TABLES").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(Set("cat_lineitem", "cat_orders", "cat_customer").subsetOf(names))
    assert(spark.catalog.tableExists("cat_lineitem"))
  }

  test("DESCRIBE exposes the declared schema") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("cat_li2")
    val cols = spark.sql("DESCRIBE cat_li2").collect()
      .map(_.getString(0)).toSet
    assert(cols.contains("l_orderkey") && cols.contains("l_shipdate"))
  }

  test("SELECT * LIMIT 10 head query via SQL over a view") {
    Tables.orders(spark, sf).createOrReplaceTempView("cat_orders2")
    assert(spark.sql("SELECT * FROM cat_orders2 LIMIT 10").count() == 10)
  }
}
