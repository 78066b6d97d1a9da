package graft

import graft.ops.DomainParse

/** PSL-aware domain parse (full tldextract parity tier — SURVEY.md §7.5 #2).
  * Cases mirror the reference's tldextract expectations
  * (`rankings_generator.py:165-167`, `ranking_urls_generator.py:150-154`).
  */
class DomainParseSpec extends SparkSpec {

  test("multi-label public suffixes win over last-two-labels") {
    assert(DomainParse.registeredDomain("shop.example.co.uk") == "example.co.uk")
    assert(DomainParse.registeredDomain("example.co.uk") == "example.co.uk")
    assert(DomainParse.registeredDomain("a.b.example.com.au") == "example.com.au")
  }

  test("single-label suffixes") {
    assert(DomainParse.registeredDomain("www.foo.com") == "foo.com")
    assert(DomainParse.registeredDomain("foo.io") == "foo.io")
  }

  test("subdomain is None when empty or www (reference `subdomain or None`)") {
    assert(DomainParse.parse("www.foo.com").subdomain.isEmpty)
    assert(DomainParse.parse("foo.com").subdomain.isEmpty)
    assert(DomainParse.parse("a.b.foo.com").subdomain.contains("a.b"))
    assert(DomainParse.parse("shop.example.co.uk").subdomain.contains("shop"))
  }

  test("degenerate inputs") {
    assert(DomainParse.registeredDomain("") == "")
    assert(DomainParse.registeredDomain(null) == "")
    assert(DomainParse.registeredDomain("localhost") == "localhost")
    assert(DomainParse.parse("com").domain == "")
  }

  test("UDF wrapper works in a DataFrame plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = Seq("shop.example.co.uk", "www.foo.com").toDF("fqdn")
      .select(DomainParse.registeredDomainCol(col("fqdn")).as("rd"),
        DomainParse.subdomainCol(col("fqdn")).as("sub"))
      .collect()
    assert(r(0).getString(0) == "example.co.uk" && r(0).getString(1) == "shop")
    assert(r(1).getString(0) == "foo.com" && r(1).getString(1) == null)
  }
}
