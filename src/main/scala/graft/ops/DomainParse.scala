package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Public-suffix-aware domain parsing — full-fidelity version of the
  * simplified last-two-labels rule in Scalars (SURVEY.md §7.5 #2).
  *
  * Mirrors the reference's tldextract usage (`rankings_generator.py:165-167`,
  * `ranking_urls_generator.py:150-154`): fqdn → (subdomain, domain, suffix),
  * where suffix comes from the public-suffix list and subdomain falls back
  * to NULL when empty or "www" (`subdomain or None`).
  *
  * A bundled mini-PSL covers the multi-label suffixes the reference data
  * exercises; a production deployment would load the full PSL file into this
  * same structure (it is a broadcast-sized lookup, ~240 KB). Implemented as
  * a Scala UDF per SURVEY.md §4.2's decision table — acceptable off the hot
  * path; a Catalyst Expression with codegen is the upgrade if it shows up
  * hot (§2.11).
  */
object DomainParse {

  /** Longest-match public suffixes (subset incl. multi-label entries). */
  val suffixes: Set[String] = Set(
    "com", "org", "net", "edu", "gov", "io", "co", "info", "biz",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.mx", "co.in", "co.nz")

  case class Parsed(subdomain: Option[String], domain: String, suffix: String)

  /** tldextract-style split: longest matching public suffix wins; the label
    * before it is the registered domain; the rest is the subdomain.
    */
  def parse(fqdnRaw: String): Parsed = {
    val fqdn = Option(fqdnRaw).getOrElse("").toLowerCase.stripSuffix(".")
    val labels = fqdn.split('.').toList.filter(_.nonEmpty)
    if (labels.isEmpty) return Parsed(None, "", "")
    // longest suffix match over the PSL
    val suffixLen = (labels.indices.reverse)
      .map(i => labels.drop(i).mkString("."))
      .filter(suffixes.contains)
      .map(s => s.count(_ == '.') + 1)
      .sorted(Ordering[Int].reverse)
      .headOption.getOrElse(0)
    val (rest, suffix) = labels.splitAt(labels.length - suffixLen)
    rest match {
      case Nil => Parsed(None, "", suffix.mkString("."))
      case r =>
        val sub = r.init.mkString(".")
        // reference: `subdomain or None`, www stripped upstream
        val subOpt = if (sub.isEmpty || sub == "www") None else Some(sub)
        Parsed(subOpt, r.last, suffix.mkString("."))
    }
  }

  /** Registered domain = domain + suffix (tldextract `registered_domain`,
    * `ranking_urls_generator.py:151`).
    */
  def registeredDomain(fqdn: String): String = {
    val p = parse(fqdn)
    if (p.domain.isEmpty) ""
    else if (p.suffix.isEmpty) p.domain
    else s"${p.domain}.${p.suffix}"
  }

  val registeredDomainUdf =
    udf((s: String) => registeredDomain(s))
  val subdomainUdf =
    udf((s: String) => parse(s).subdomain.orNull)

  def registeredDomainCol(c: Column): Column = registeredDomainUdf(c)
  def subdomainCol(c: Column): Column = subdomainUdf(c)
}
