package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Scalars

/** Extension tier — SURVEY.md §2.11 / BASELINE.json north star: the
  * operations a large-scale training-data pipeline needs, designed for
  * 100 TB and verified against DuckDB at sf0.01.
  *
  * Scale design notes:
  *  - Exact dedup (q40): hash-groupBy — one shuffle on the content hash;
  *    at 100 TB, group on sha2 (fixed 32B key) instead of raw text so the
  *    shuffle carries hashes, not documents.
  *  - MinHash (q47/q53): signatures are computed per-row (no shuffle); LSH
  *    banding turns near-dup search from O(n²) into an equi-join on band
  *    keys — the only shuffle is on (band, key), which is the scalable path.
  *    The cross-engine-deterministic token hash (md5-hex→long) lives in
  *    Scalars.tokenHash so DuckDB replays the identical signature.
  *  - Brute-force cosine (q41) broadcasts the *query set* and streams the
  *    corpus — correct baseline at any corpus size as long as |queries| is
  *    broadcastable. The LSH-bucketed variant (q51) is the scale path:
  *    equi-join on sign-bucket instead of a nested loop.
  *  - Pairwise ops (q48/q50) are intentionally bounded to a small id-range:
  *    at scale they would be preceded by the LSH candidate stage (q53).
  */
object QueriesText {
  import Tables._

  // ---- shared cosine machinery -------------------------------------------
  /** Elementwise dot product of two float-array columns in double precision,
    * summed left-to-right (matches DuckDB list_sum(list_transform(...))).
    */
  private[graft] def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private[graft] def norm(a: Column): Column = sqrt(dot(a, a))

  private[graft] def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Embeddings with the L2 norm materialized through an exchange. Without
    * the barrier CollapseProject inlines the norm aggregate into every
    * downstream pair expression, recomputing it per candidate pair; with it
    * each vector's norm is computed exactly once — the correct shape at any
    * corpus size.
    */
  private[graft] def withNorm(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
      .repartition(col("vec_id"))

  /** q119's candidate stage, extracted so PlanSpec can gate its join shape
    * (the closure's internal checkpoint truncates lineage, hiding this
    * plan from the declared query's executedPlan): cosine-τ edges over the
    * (coarse IVF cell × 4-bit sign sub-bucket) composite block.
    */
  private[graft] def semanticEdges(e: DataFrame): DataFrame = {
    import graft.pipelines.AnnIndexPipeline
    val sub = (0 until 4).map { j =>
      when(element_at(col("embedding"), j + 1) > 0f, lit(1 << j))
        .otherwise(0)
    }.reduce(_ + _)
    // r16: materialize the blocked table once — exchange reuse does not
    // fire across the aliased self-join sides, so the assign stage
    // (centroid scoring + argmax window) otherwise ran on BOTH sides
    val blocked = AnnIndexPipeline
      .assign(e, AnnIndexPipeline.centroids(e))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cell"), sub.as("sub"))
      .localCheckpoint(true)
    val x = blocked.select(col("vec_id").as("a_id"),
      col("embedding").as("a_e"), col("nrm").as("a_n"),
      col("cell"), col("sub"))
    val y = blocked.select(col("vec_id").as("b_id"),
      col("embedding").as("b_e"), col("nrm").as("b_n"),
      col("cell"), col("sub"))
    x.join(y, Seq("cell", "sub"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos",
        dot(col("a_e"), col("b_e")) / (col("a_n") * col("b_n")))
      .filter(col("cos") >= 0.30)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
  }

  /** DuckDB rendition of the same computation (1-based list indexing; 64-dim
    * vectors per FIXTURES.md §B). Summation order matches Spark's aggregate.
    */
  private[graft] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private[graft] def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** From-scratch IVF build + top-3 search (fixed first-10 centroids) —
    * the shared oracle of the one-shot q54 AND the incremental q117: the
    * fold's per-vector assignment is split-invariant, so both declared
    * forms must reproduce exactly this result.
    */
  private[graft] lazy val ivfOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_emb
       |               FROM embeddings WHERE vec_id < 10),
       |scoredcells AS (
       |  SELECT e.vec_id, e.embedding, c.c_id,
       |    ${dotSql("e.embedding", "c.c_emb")} AS cdot,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dotSql("e.embedding", "c.c_emb")} DESC,
       |               c.c_id ASC) AS crn
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, c_id AS cell
       |  FROM scoredcells WHERE crn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb, cell
       |      FROM assigned WHERE vec_id < 3),
       |pairs AS (
       |  SELECT q.q_id, a.vec_id,
       |    ${cosSql("a.embedding", "q.q_emb")} AS cos
       |  FROM assigned a JOIN q ON a.cell = q.cell
       |  WHERE a.vec_id <> q.q_id),
       |scored AS (
       |  SELECT q_id, vec_id, cos, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM pairs)
       |SELECT q_id, CAST(rn AS INT) AS rn, vec_id,
       |       round(cos, 6) AS cos_sim
       |FROM scored WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin

  // ---- minhash constants (shared with the DuckDB oracle) -----------------
  private[graft] val MinhashAB = Seq((2971L, 1129L), (3511L, 2029L),
    (4111L, 3037L), (5519L, 4073L))
  private[graft] val P = Scalars.HashP

  /** DuckDB token hash identical to Scalars.tokenHash. */
  private[graft] def tokSql(w: String): String =
    s"(('0x' || substr(md5($w), 1, 15))::BIGINT)"
  private[graft] def mhSql(w: String, a: Long, b: Long): String =
    s"(($a * (${tokSql(w)} % $P) + $b) % $P)"

  private[graft] def minhashSqlExpr(a: Long, b: Long): String =
    s"CAST(list_aggregate(list_transform(hs, h -> (($a * h + $b) % $P)), " +
      s"'min') AS BIGINT)"
  private[graft] val tokenHashesSql =
    s"list_transform(ws, w -> (${tokSql("w")} % $P))"

  /** Relational MinHash signatures: explode shingles, hash each once, one
    * partial+final aggregation with a min() measure per hash function.
    * Equivalent to array_min(transform(...)) per row but with small
    * codegen'd expressions (array-lambda mega-expressions execute
    * interpreted on first run — measured 10-50s at sf0.1) and map-side
    * combine, so the shuffle is one row per doc — the 100 TB shape.
    */
  /** LSH candidate pairs (a_id < b_id), distinct — shared by q53 (the
    * declared pair query) and q92 (cluster transitive closure).
    * minhashSigs ends in an aggregation, which doubles as the
    * materialization barrier: band keys and the self-join below see four
    * plain longs per doc, never the shingle+md5 pipeline.
    */
  private[graft] def bandPairs(docs: DataFrame): DataFrame =
    // r16: materialize the band index before the aliased self-join —
    // once AQE broadcasts one side, the sides' subtrees differ (broadcast
    // vs shuffle exchange) and NO exchange/stage reuse can fire, so the
    // whole shingle+signature pipeline ran TWICE (verified on q53's
    // executed plan: two parquet scans, two Generate+agg chains). The
    // checkpoint is doc-sized (2 band keys per doc) and is exactly the
    // table the incremental pipeline persists anyway.
    bandPairsFrom(bandKeys(docs).localCheckpoint(true))

  /** The candidate self-join over an EXISTING `(doc_id, band_key)` table —
    * shared by the from-scratch path ([[bandPairs]]) and consumers of the
    * persisted index (q128 probes `DedupPipeline.cachedFold(...).bands`
    * so the audit never re-shingles the corpus).
    */
  private[graft] def bandPairsFrom(bands: DataFrame): DataFrame = {
    val a = bands.select(col("doc_id").as("a_id"), col("band_key"))
    val b = bands.select(col("doc_id").as("b_id"), col("band_key"))
    a.join(b, Seq("band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** CONTENT-level LSH candidate pairs (the round-9 copy-invariant
    * lesson, as in q119/q139: exact-dedup FIRST): verbatim copies share
    * identical band keys, so doc-level edges form O(copies²) cliques
    * that add zero information — contract to one node per distinct text
    * (min doc_id) before pairing. All contraction exchanges are narrow
    * (hash/id/band_key); text never rides a shuffle. Shared by q167
    * (PageRank) and q170 (triangle count).
    */
  private[graft] def contractedPairs(s: SparkSession, d: String)
      : DataFrame = {
    val withH = documents(s, d).select(col("doc_id"),
      sha2(col("text"), 256).as("h"))
    val nodeOf = withH.groupBy("h").agg(min(col("doc_id")).as("node"))
    val docNode = withH.join(nodeOf, "h").select("doc_id", "node")
    val nodeBands = bandKeys(documents(s, d)).join(docNode, "doc_id")
      .select(col("node").as("doc_id"), col("band_key")).distinct()
      // materialized for the same reason as [[bandPairs]] (r16): the
      // aliased self-join sides cannot share stages once one side
      // broadcasts, so the contraction pipeline ran twice
      .localCheckpoint(true)
    bandPairsFrom(nodeBands)
  }

  /** DuckDB replay of [[contractedPairs]] — CTEs ending in
    * `pairs(a_id, b_id)`; callers prepend `WITH ` and append consumers.
    */
  private[graft] lazy val contractedPairsSqlCtes: String = {
    def h(i: Int): String = minhashSqlExpr(MinhashAB(i)._1, MinhashAB(i)._2)
    s"""t AS (SELECT doc_id, $shinglesSql AS ws FROM documents),
       |th AS (SELECT doc_id, $tokenHashesSql AS hs FROM t),
       |sig AS (SELECT doc_id, ${h(0)} AS h0, ${h(1)} AS h1,
       |               ${h(2)} AS h2, ${h(3)} AS h3 FROM th),
       |bands AS (
       |  SELECT doc_id, ('b0-' || h0 || '-' || h1) AS band_key FROM sig
       |  UNION ALL
       |  SELECT doc_id, ('b1-' || h2 || '-' || h3) AS band_key FROM sig),
       |nodeof AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS node
       |  FROM documents),
       |nbands AS (
       |  SELECT DISTINCT n.node AS doc_id, b.band_key
       |  FROM bands b JOIN nodeof n ON b.doc_id = n.doc_id),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM nbands a JOIN nbands b ON a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id)""".stripMargin
  }

  /** LSH band keys per doc, `(doc_id, band_key)` — the PERSISTABLE form of
    * the signature index: band keys are what candidate joins probe, so the
    * incremental pipeline ([[graft.pipelines.DedupPipeline.addBatch]])
    * stores exactly this table and joins each new batch against it instead
    * of re-shingling the corpus.
    */
  private[graft] def bandKeys(docs: DataFrame): DataFrame =
    minhashSigs(docs).select(col("doc_id"),
      explode(array(
        concat_ws("-", lit("b0"), col("h0"), col("h1")),
        concat_ws("-", lit("b1"), col("h2"), col("h3")))).as("band_key"))

  private[graft] def minhashSigs(docs: DataFrame): DataFrame = {
    val mins = MinhashAB.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"h$i")
    }
    // Shingles built MAP-SIDE (one small slice-transform per doc, the q87
    // 5-gram idiom and the oracle's own shinglesSql form) and hashed after
    // the explode. The previous relational form (posexplode + window lead)
    // computed the identical shingle set but paid a full exchange AND sort
    // of the exploded corpus token stream for the doc_id-partitioned
    // window (guide §2.4: remove shuffles outright) — measured on q47 at
    // sf0.1: 0.98 s → 0.60 s, plan 4 exchanges → 3 with the token-stream
    // Exchange+Window gone; every signature consumer (q53/q92/q93/q75/
    // q112/q115/q135/q145/q212) inherits the saving. Docs under 3 words
    // carry no 3-shingle and are dropped, exactly as the window form's
    // w2-isNotNull filter did. min() is insensitive to duplicate shingles,
    // so no distinct step is needed before hashing.
    fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 2), " +
          "i -> concat_ws(' ', slice(t, i, 3)))")).as("sh"))
      .select(col("doc_id"), (Scalars.tokenHash(col("sh")) % P).as("h"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
  }

  /** DuckDB rendition of Scalars.shingles3 (range() is stop-exclusive, so
    * range(1, len-1) = 1..len-2, matching Spark's inclusive sequence).
    */
  private[graft] val shinglesSql =
    """(CASE WHEN len(str_split(text, ' ')) >= 3
      |  THEN list_distinct(list_transform(
      |    range(1, len(str_split(text, ' ')) - 1),
      |    i -> str_split(text, ' ')[i] || ' ' ||
      |         str_split(text, ' ')[i+1] || ' ' ||
      |         str_split(text, ' ')[i+2]))
      |  ELSE [text] END)""".stripMargin

  /** The dedup-closure replay shared by the q92/q93/q135 oracles: shingles
    * → minhash signatures → band keys → candidate pairs → symmetric edges
    * → recursive reachability → per-vertex min-label component (the SQL
    * twin of DedupPipeline.labels). Callers prepend `WITH RECURSIVE` and
    * append their consumer CTEs / final SELECT.
    */
  private[graft] lazy val closureSqlCtes: String =
    closureSqlCtesOver("documents")

  /** [[closureSqlCtes]] over an arbitrary source CTE/table — the q212
    * funnel replays the closure over the corpus MINUS the benchmark
    * holdout, exactly as CurationPipeline stage 2 does.
    */
  private[graft] def closureSqlCtesOver(table: String): String = {
    def h(i: Int): String = minhashSqlExpr(MinhashAB(i)._1, MinhashAB(i)._2)
    s"""t AS (SELECT doc_id, $shinglesSql AS ws FROM $table),
       |th AS (SELECT doc_id, $tokenHashesSql AS hs FROM t),
       |sig AS (SELECT doc_id, ${h(0)} AS h0, ${h(1)} AS h1,
       |               ${h(2)} AS h2, ${h(3)} AS h3 FROM th),
       |bands AS (
       |  SELECT doc_id, ('b0-' || h0 || '-' || h1) AS band_key FROM sig
       |  UNION ALL
       |  SELECT doc_id, ('b1-' || h2 || '-' || h3) AS band_key FROM sig),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b ON a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION
       |  SELECT b_id, a_id FROM pairs),
       |verts AS (SELECT DISTINCT src AS v FROM edges),
       |reach(v, r) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e
       |    ON e.src = reach.v),
       |comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v)"""
      .stripMargin
  }

  /** q123's exact fixed-point BM25 scorer over the fixed 3-term query —
    * (doc_id, terms_hit, score_fp), un-ranked — shared by the standalone
    * relevance ranking (q123) and the RRF hybrid fusion (q134). Semantics
    * and the cross-engine fixed-point discipline are documented at q123.
    */
  private[graft] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("vector", "stream", "query")
    val base = fanOut(documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("l_total"))
    val hit = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = hit.groupBy("tok").agg(count(lit(1)).as("df"))
    hit.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("numer", lit(22L) * col("tf") * col("l_total") *
        (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)))
      .withColumn("denom",
        (lit(10L) * col("tf") * col("l_total") +
          lit(3L) * col("l_total") +
          lit(9L) * col("dl") * col("n_docs")) *
          (lit(2L) * col("df") + lit(1L)))
      .withColumn("term_fp",
        floor(lit(1e9) * col("numer") / col("denom")).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("terms_hit"), sum("term_fp").as("score_fp"))
  }

  /** DuckDB twin of [[bm25Scored]]: CTE chain ending in
    * `bm25(doc_id, terms_hit, score_fp)`. Callers prepend `WITH`.
    */
  private[graft] lazy val bm25SqlCtes: String =
    """base AS (SELECT doc_id, str_split(text, ' ') AS toks
      |             FROM documents),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |            CAST(sum(len(toks)) AS BIGINT) AS l_total
      |          FROM base),
      |hit AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf,
      |          max(dl) AS dl
      |        FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
      |                unnest(toks) AS tok FROM base)
      |        WHERE tok IN ('vector', 'stream', 'query')
      |        GROUP BY 1, 2),
      |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
      |          FROM hit GROUP BY 1),
      |scored AS (SELECT h.doc_id,
      |    CAST(floor((1e9 * (22 * h.tf * s.l_total *
      |        (2 * s.n_docs - 2 * f.df + 1))) /
      |      ((10 * h.tf * s.l_total + 3 * s.l_total +
      |        9 * h.dl * s.n_docs) * (2 * f.df + 1)))
      |      AS BIGINT) AS term_fp
      |  FROM hit h JOIN dfreq f USING (tok) CROSS JOIN stats s),
      |bm25 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS terms_hit,
      |    CAST(sum(term_fp) AS BIGINT) AS score_fp
      |  FROM scored GROUP BY doc_id)""".stripMargin

  /** q125's per-doc bigram-LM fluency scores, factored so the CCNet-style
    * bucketing tier (q144) reuses the identical exact arithmetic:
    * (doc_id, n_bigrams, score_fp) with score_fp = Σ tf·p_fp where
    * p_fp = (1e9·c12) DIV c1 — see q125's scaladoc for the scale shape
    * (three aggs, one vocab²-bounded equi-join, one corpus explode).
    */
  private[graft] def bigramDocScores(s: SparkSession, d: String): DataFrame = {
    // r16 (guide §2.3/§2.4): the old form pre-aggregated per (doc, pair)
    // tf and hung BOTH the model build and the score join off that
    // (doc_id, pair)-exchanged table — 5 bigram-scale exchanges end to
    // end. The model only needs PER-PAIR counts (map-side combinable
    // straight off the explode: c12 per pair, c1 per first word), and the
    // per-doc score is the plain sum of p_fp over bigram INSTANCES
    // (Σ tf·p_fp ≡ Σ_instances p_fp), so the (doc, pair) exchange is
    // dropped entirely: c12 exchange(pair) + tiny l-agg + instances ⋈
    // model on pair + final (doc_id) agg. The fanOut exchange under both
    // explode branches is one reused subtree. Values are identical
    // (n_bigrams = instance count = Σ tf; same integer model).
    val raw = fanOut(documents(s, d))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i], toks[i + 1]))")).as("pair"))
    val c12 = raw.groupBy("pair").agg(count(lit(1)).as("c12"))
      .withColumn("l", expr("split_part(pair, ' ', 1)"))
    val c1 = c12.groupBy("l").agg(sum("c12").as("c1"))
    val model = c12.join(c1, "l")
      .select(col("pair"),
        expr("CAST(1000000000 * c12 AS BIGINT) DIV c1").as("p_fp"))
    raw.join(model, "pair")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_fp")).as("score_fp"))
  }

  /** q139/q145's shared verification stage: every persisted-index band
    * candidate pair with its exact character-level edit similarity in ppm
    * fixed point. Candidates BROADCAST into two narrow (doc_id, text)
    * probes (q128's shape — the corpus is scanned once per side, never
    * shuffled); fanOut because levenshtein is the rare op whose per-ROW
    * cost is O(len²) and the local single-row-group scan would run it
    * one-task; exact duplicates (levenshtein 0 by definition)
    * short-circuit on an O(len) equality, so the quadratic work tracks
    * NEAR-dup density, not the (much larger at sf1) exact-dup density.
    */
  /** Per-candidate-pair exact edit-distance verification over the
    * persisted band index, computed ONCE PER DISTINCT CONTENT PAIR —
    * the q119 exact-dedup-first lesson applied to the verification
    * stage. Under exact-copy replication every copy of A band-collides
    * with every copy of B, so the ID-pair count grows with copy
    * multiplicity SQUARED while the distinct-content pair count doesn't
    * grow at all (measured at sf1: ~250k ID pairs, ~270 unequal content
    * pairs — a 900× reduction in levenshtein invocations). Structure:
    * candidate ID pairs are content-tagged (two broadcast probes over
    * the narrow (doc_id, sha2) projection), equal-content pairs
    * short-circuit to edit_dist = 0, the O(len²) levenshtein runs once
    * per distinct UNEQUAL content pair on one representative text each,
    * and the verdict fans back out through the content tags. Every
    * broadcast side (pairs, content-pair verdicts, per-content lengths)
    * is duplicate-density-sized; the corpus is only ever scanned for
    * the narrow hash projection (~3× via reused broadcast subtrees —
    * a production run would persist the content tags; the exchanges are
    * reused within each executed plan).
    */
  private[graft] def editSims(s: SparkSession, d: String): DataFrame = {
    val hashed = documents(s, d)
      .select(col("doc_id"), col("text"), sha2(col("text"), 256).as("ch"),
        length(col("text")).cast("long").as("ln"))
    val pairs = bandPairsFrom(
      graft.pipelines.DedupPipeline.cachedFold(s, d).bands)
    // content tags carry the length, so max_len needs no extra join
    val withA = hashed.select(col("doc_id").as("a_id"),
      col("ch").as("ca"), col("ln").as("la"))
      .join(broadcast(pairs), Seq("a_id"))
    val ab = hashed.select(col("doc_id").as("b_id"),
      col("ch").as("cb"), col("ln").as("lb"))
      .join(broadcast(withA), Seq("b_id"))
    // levenshtein once per distinct unequal content pair, on one
    // representative text per participating content
    val cp = ab.filter(col("ca") =!= col("cb"))
      .select("ca", "cb").distinct()
    val pcs = cp.select(col("ca").as("ch"))
      .union(cp.select(col("cb"))).distinct()
    val wch = Window.partitionBy("ch").orderBy("doc_id")
    val reps = hashed.join(broadcast(pcs), Seq("ch"))
      .withColumn("rn", row_number().over(wch)).filter(col("rn") === 1)
      .select(col("ch"), col("text"))
    val ver = Tables.fanOut(
      reps.select(col("ch").as("cb"), col("text").as("b_text"))
        .join(broadcast(
          reps.select(col("ch").as("ca"), col("text").as("a_text"))
            .join(broadcast(cp), Seq("ca"))), Seq("cb")))
      .select(col("ca"), col("cb"),
        levenshtein(col("a_text"), col("b_text")).cast("long").as("ed"))
    ab
      .join(broadcast(ver), Seq("ca", "cb"), "left")
      .select(col("a_id"), col("b_id"),
        coalesce(col("ed"), lit(0L)).as("edit_dist"),
        greatest(col("la"), col("lb")).as("max_len"))
      .withColumn("sim_ppm",
        expr("(1000000L * (max_len - edit_dist)) DIV max_len"))
  }

  /** DuckDB CTE chain replaying [[bigramDocScores]] exactly; terminal CTE
    * is `lmsc(doc_id, n_bigrams, score_fp)`. */
  private[graft] val bigramScoreSqlCtes: String =
    """base AS (SELECT doc_id, str_split(text, ' ') AS toks
      |         FROM documents),
      |bg AS (
      |  SELECT doc_id, split_part(pair, ' ', 1) AS l, pair,
      |    CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(list_transform(
      |          range(1, len(toks)),
      |          i -> toks[i] || ' ' || toks[i + 1])) AS pair
      |        FROM base WHERE len(toks) >= 2)
      |  GROUP BY 1, 2, 3),
      |c12 AS (SELECT l, pair, CAST(sum(tf) AS BIGINT) AS c12
      |        FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT l, CAST(sum(c12) AS BIGINT) AS c1
      |       FROM c12 GROUP BY 1),
      |model AS (SELECT pair,
      |    CAST((1000000000 * c12) // c1 AS BIGINT) AS p_fp
      |  FROM c12 JOIN c1 USING (l)),
      |lmsc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
      |    CAST(sum(tf * p_fp) AS BIGINT) AS score_fp
      |  FROM bg JOIN model USING (pair)
      |  GROUP BY doc_id)""".stripMargin

  /** The text extension tier registry — split by family in round 11
    * (QueriesTextDedup / QueriesTextAnn / QueriesTextAnalysis /
    * QueriesTextGraphMedia); this object keeps the shared machinery
    * (hash families, signatures, band joins, contraction, cosine) that
    * the family files and pipelines/ import. Lazy so object init runs
    * helpers-first, never re-entering during family construction.
    */
  lazy val all: Seq[Q] = QueriesTextDedup.all ++ QueriesTextAnn.all ++
    QueriesTextAnalysis.all ++ QueriesTextGraphMedia.all
}
