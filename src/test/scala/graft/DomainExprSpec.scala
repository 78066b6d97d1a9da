package graft

import org.apache.spark.sql.functions._

import graft.ops.{DomainParse, RegisteredDomainExpr}

/** Native Catalyst expression tier for the PSL domain parse: same semantics
  * as the UDF, but codegen-participating and SQL-addressable.
  */
class DomainExprSpec extends SparkSpec {
  import spark.implicits._

  test("registered_domain native expression matches the UDF on all cases") {
    RegisteredDomainExpr.register(spark)
    val fqdns = Seq("shop.example.co.uk", "www.foo.com", "a.b.c.example.com.au",
      "foo.io", "localhost", "", "x.co")
    val df = fqdns.toDF("fqdn")
      .withColumn("viaExpr", expr("registered_domain(fqdn)"))
      .withColumn("viaUdf", DomainParse.registeredDomainCol(col("fqdn")))
    assert(df.collect().forall(r => r.getString(1) == r.getString(2)))
  }

  test("registered_domain works from pure SQL and handles NULL") {
    RegisteredDomainExpr.register(spark)
    val r = spark.sql(
      "SELECT registered_domain('shop.example.co.uk') AS rd, " +
        "registered_domain(CAST(NULL AS STRING)) AS rdnull").collect().head
    assert(r.getString(0) == "example.co.uk")
    assert(r.isNullAt(1))
  }

  test("native expression stays inside whole-stage codegen") {
    RegisteredDomainExpr.register(spark)
    val df = Tables.supplier(spark, sf)
      .select(expr("registered_domain(concat('www.sup', s_suppkey, '.example.co.uk'))")
        .as("rd"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
    // every fqdn reduces to the same registered domain
    val d = df.distinct().collect()
    assert(d.length == 1 && d.head.getString(0) == "example.co.uk")
  }
}
