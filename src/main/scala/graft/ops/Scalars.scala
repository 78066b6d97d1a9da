package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions — SURVEY.md §2.8. Each is a pure `Column =>
  * Column` built from codegen'd built-in expressions (no UDFs), so filter
  * pushdown and whole-stage codegen stay intact at 100 TB scale.
  *
  * Reference behavior being re-expressed (file:line in /root/reference):
  *  - urlBone: `rankings_generator.py:132-139` (strip scheme + `www.` +
  *    trailing `/`, case-insensitive scheme test via lower()).
  *  - urlPrefix: `ranking_urls_ingestor.py:58` regex `(https?://(?:www\.)?)`.
  *  - registeredDomain/subdomain: simplified last-two-labels rule standing in
  *    for tldextract (`rankings_generator.py:165-167`); `www`/empty subdomain
  *    → NULL.
  *  - epochToDateStr: `rankings_generator.py:155`
  *    `datetime.fromtimestamp(ts).date().strftime("%Y-%m-%d")` (UTC session).
  *  - parsePyList: `ranking_urls_ingestor.py:60-61` `ast.literal_eval` on
  *    Python-list strings (single-quoted, no embedded quotes/commas — the
  *    reference's faker words are safe, `rankings_generator.py:172`).
  *  - chunkId: `ranking_urls_generator.py:54-55` stride chunking.
  */
object Scalars {

  /** Strip `http(s)://(www.)` prefix case-insensitively and a trailing `/`. */
  def urlBone(url: Column): Column =
    regexp_replace(
      regexp_replace(url, "(?i)^https?://(www\\.)?", ""),
      "/$", "")

  /** Extract the scheme+www prefix; empty string when absent (pandas
    * `str.extract` yields NaN — we keep "" to stay join/group-friendly and
    * the declared query documents it).
    */
  def urlPrefix(url: Column): Column =
    regexp_extract(url, "(https?://(?:www\\.)?)", 1)

  /** Simplified registered-domain: last two dot-labels. Full PSL parity is
    * not SQL-expressible and lives in unit tests only (SURVEY.md §7.5).
    */
  def registeredDomain(fqdn: Column): Column =
    regexp_extract(fqdn, "([^.]+\\.[^.]+)$", 1)

  /** Subdomain = fqdn minus registered domain minus separating dot; NULL when
    * empty (mirrors `subdomain or None`, `rankings_generator.py:167`).
    */
  def subdomain(fqdn: Column): Column = {
    val reg = registeredDomain(fqdn)
    // substring arithmetic keeps it expressible identically in DuckDB
    when(length(fqdn) - length(reg) > 1,
      fqdn.substr(lit(1), length(fqdn) - length(reg) - 1))
  }

  /** Epoch seconds → "yyyy-MM-dd" (session TZ pinned UTC). */
  def epochToDateStr(epochSec: Column): Column =
    date_format(from_unixtime(epochSec), "yyyy-MM-dd")

  /** Python-list string `['a', 'b']` → array<string>, general form.
    * Note: JsonToStructs is CodegenFallback (breaks whole-stage codegen and
    * pays a hefty first-use JIT cost) — hot paths with the reference's
    * quote-free single-word elements should prefer parsePyListFast.
    */
  def parsePyList(s: Column): Column =
    from_json(translate(s, "'", "\""),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))

  /** Codegen-friendly Python-list parse for the reference's actual data
    * contract (faker words: no embedded quotes/commas/brackets —
    * `rankings_generator.py:172`, SURVEY.md §7.5 #3): strip `['`/`']`,
    * split on `', '`.
    */
  def parsePyListFast(s: Column): Column =
    split(regexp_replace(s, "^\\['|'\\]$", ""), "', '")

  /** Stride chunk id for a 1-based row_number: floor((rn-1)/size). */
  def chunkId(rowNumber1Based: Column, size: Int): Column =
    floor((rowNumber1Based - 1) / size).cast("long")

  /** Cross-engine deterministic 60-bit token hash: first 15 hex digits of
    * md5, as a non-negative long. DuckDB equivalent:
    * `('0x' || substr(md5(t), 1, 15))::BIGINT`. Used by minhash/simhash so
    * the DuckDB oracle can replay the exact same hash (SURVEY.md §2.11).
    *
    * Since round 12 this routes through the native codegen
    * [[TokenHashExpr]] (md5 → top 60 bits direct — no hex-string
    * round-trip; bit-identical by construction, pinned by
    * TokenHashExprSpec incl. codegen-off). The pre-native declarative
    * form is kept as [[tokenHashConv]] for the identity spec.
    */
  def tokenHash(t: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TokenHashExpr(ColumnBridge.expression(t)))
  }

  /** The declarative (conv ∘ substring ∘ md5) form tokenHash replaced —
    * retained ONLY as the bit-identity witness in TokenHashExprSpec.
    */
  private[graft] def tokenHashConv(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Universal-hash family over tokenHash, mod a 31-bit prime so products
    * stay in long range: h_i(t) = (a_i * (base % P) + b_i) % P.
    */
  val HashP = 1000000007L
  def minhashFn(t: Column, a: Long, b: Long): Column =
    (lit(a) * (tokenHash(t) % HashP) + lit(b)) % HashP

  /** Integral division of a named long column — `c DIV d`, the 64-bit-exact
    * form. `Column./` always promotes to double, whose 53-bit mantissa
    * cannot hold epoch-nanos (~2^60): `cast(ts as double)` rounds by up to
    * 256 ns, which can misbucket a timestamp near a boundary. Every bucket
    * derivation on `events.ts` must go through this (Tables.events).
    */
  def longDiv(colName: String, divisor: Long): Column =
    expr(s"$colName DIV ${divisor}L")

  /** Cross-engine-exact round-to-2dp for row-level derived doubles.
    * Spark's round() rounds the *shortest decimal rendering* of the double
    * (BigDecimal.valueOf), DuckDB rounds the *binary value* — they disagree
    * on near-half products (e.g. 21745.35*0.9 = 19570.814999999998...).
    * floor(x*100 + 0.5)/100 is pure IEEE arithmetic, so both engines get
    * bit-identical results from identical inputs. Positive domains only.
    */
  def round2(x: Column): Column = floor(x * 100 + lit(0.5)) / 100

  /** DuckDB rendition of round2 for oracle SQL. */
  def round2Sql(x: String): String = s"(floor(($x) * 100 + 0.5) / 100)"

  /** Exact integer-cents quantization of a NON-NEGATIVE money double —
    * the integer-domain twin of [[round2]]: floor(x·100 + 0.5) as BIGINT,
    * identical IEEE arithmetic in both engines. Domain contract: x ≥ 0
    * (events.value is generated ≥ 0.01; TablesSpec pins the schema). The
    * contract matters because downstream integer division over these
    * cents uses Spark `DIV` (truncates toward zero) where DuckDB uses
    * `//` (floors) — equivalent only on a non-negative domain. A signed
    * money column would need a floor-division helper instead; asserting
    * here per row would put a branch on the hottest agg path for a
    * condition the generator rules out, so the contract is documented +
    * spec-pinned (ScalarsSpec) rather than runtime-checked.
    */
  def cents(x: Column): Column = floor(x * 100 + lit(0.5)).cast("long")

  /** DuckDB rendition of cents for oracle SQL. */
  def centsSql(x: String): String =
    s"CAST(floor(($x) * 100 + 0.5) AS BIGINT)"

  /** Composite (sig, doc_id) sort key for GlobalRank's double-typed rank
    * path: sig·2³¹ + doc_id, with doc_id recovered downstream by % 2³¹.
    * Exactness window: the rank machinery casts the key to double, so the
    * pack is exact only while sig·2³¹ + doc_id < 2⁵³, i.e. sig ∈ [0, 2²²)
    * (2²² = 4 194 304 — ppm signals and token counts qualify) AND
    * doc_id ∈ [0, 2³¹). BOTH bounds are enforced PER ROW via assert_true
    * because violation is otherwise silent: both the rank order and the
    * recovered doc_id corrupt, with no error (an oversized sig — e.g. a
    * >4.1M-token doc — would corrupt just as silently as an oversized
    * doc_id). Testdata stays inside the doc_id bound only by construction
    * (tools/scale_testdata.py shifts ids by copy·STRIDE=1e8; FACTOR ≥ 23
    * breaches 2³¹ — see the STRIDE note there), and a real corpus has no
    * cap at all — this guard turns that assumption into an error instead
    * of wrong answers.
    */
  def packId(sig: Column, docId: Column): Column = {
    val guard = coalesce(
      assert_true(
        docId >= 0 && docId < lit(2147483648L) &&
          sig >= 0 && sig < lit(4194304L),
        lit("Scalars.packId: doc_id outside [0, 2^31) or sig outside " +
          "[0, 2^22) silently corrupts the packed rank key — re-key or " +
          "widen the radix")).cast("long"),
      lit(0L))
    sig * lit(2147483648L) + docId + guard
  }

  /** Order-independent money sum. A double sum over millions of rows is
    * accumulation-order-dependent: at sf1 (6M lineitem rows) Spark's
    * partial-agg merge order vs DuckDB's produced grand totals differing
    * in the cents digit (observed on q60), so engine-vs-oracle equality
    * of `round(sum(double), 2)` is not well-defined at scale. The fix is
    * the one a money pipeline uses anyway: quantize each row to cents
    * (the input is either an exact-2dp source column, which the
    * DECIMAL(18,2) cast snaps losslessly, or a derived product already
    * quantized by [[round2]]), then sum EXACTLY in decimal — associative,
    * so partial aggregation order cannot matter — and convert the one
    * exact total to double at the end (a single identical rounding in
    * both engines). DECIMAL(18,2) holds ±10^16 cents: a 100 TB corpus of
    * prices fits with headroom, and Spark widens the sum buffer to
    * DECIMAL(28,2) on top.
    */
  def moneySum(centsQuantized: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    sum(centsQuantized.cast(DecimalType(18, 2))).cast("double")
  }

  /** DuckDB rendition of moneySum for oracle SQL. */
  def moneySumSql(centsQuantized: String): String =
    s"CAST(sum(CAST(($centsQuantized) AS DECIMAL(18,2))) AS DOUBLE)"

  /** round2 generalized to n decimal places (n ≤ 15 so 10^n is exact in
    * double). Same positive-domain floor-form contract as round2.
    */
  def roundAt(x: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(x * p + lit(0.5)) / p
  }

  /** DuckDB rendition of roundAt for oracle SQL. */
  def roundAtSql(x: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"(floor(($x) * $p + 0.5) / $p)"
  }

  /** Distinct 3-word shingles of a text column — the MinHash feature set.
    * Word-level minhash over a small vocabulary collides catastrophically
    * (measured: 7.58M LSH candidate pairs vs 493 with shingles on the sf0.1
    * documents table); shingling is the standard fix (SURVEY.md §2.11 X2).
    * Guard: <3 words → the whole text as one shingle.
    *
    * Since round 13 this routes through the native codegen
    * [[Shingles3Expr]] (one byte walk emitting zero-copy substring
    * slices — the shingle join separator equals the split separator, so
    * shingles ARE substrings; no words array, no interpreted transform
    * lambda). Bit-identical to the declarative HOF form, which is kept
    * as [[shingles3Conv]] for the identity spec; DuckDB replays the same
    * set via QueriesText.shinglesSql.
    */
  def shingles3Text(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Shingles3Expr(ColumnBridge.expression(text)))
  }

  /** The declarative array-transform form shingles3Text replaced —
    * retained ONLY as the bit-identity witness in Shingles3ExprSpec
    * (1-based element_at matches DuckDB list indexing). Interpreted
    * (ArrayTransform is CodegenFallback): do not put on a hot path.
    */
  private[graft] def shingles3Conv(words: Column): Column =
    when(size(words) >= 3,
      array_distinct(transform(sequence(lit(1), size(words) - 2),
        i => concat_ws(" ",
          element_at(words, i),
          element_at(words, i + 1),
          element_at(words, i + 2)))))
      .otherwise(array(concat_ws(" ", words)))
}
