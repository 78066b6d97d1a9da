package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Scalars

/** Text-analysis family (SURVEY.md §2.11 X4–X8/X20/X21/X36/X37/X40/
  X48/X50/X56/X65/X73/X81): stats, language id, quality scoring, token
  counting, fingerprints, TF-IDF, CMS heavy hitters, vocab coverage,
  BPE mining, LM scoring, CCNet buckets, leakage audits, dataset card,
  phrase search, novelty curve.
  *
  * Split out of QueriesText.scala in round 11 (the file had reached
  * 3,300 lines across 9 families — VERDICT r10 #7); queries are
  * verbatim, the registry order groups by family now.
  */
object QueriesTextAnalysis {
  import Tables._
  import QueriesText._

  val all: Seq[Q] = Seq(

    // X4 text stats: per-language counts and means.
    Q("q42_text_stats",
      (s, d) => documents(s, d)
        .select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).as("n_words"))
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"),
          round(avg("n_chars"), 2).as("avg_chars"),
          round(avg("n_words"), 2).as("avg_words"))
        .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
             |  round(avg(n_chars), 2) AS avg_chars,
             |  round(avg(len(str_split(text, ' '))), 2) AS avg_words
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Language-ID heuristic: stopword-hit ratio over an inline English
    // stopword list (n-gram/stopword heuristic per the north star).
    Q("q43_lang_id",
      (s, d) => {
        val stops = array(Seq("the", "a", "of", "and", "to", "in").map(lit): _*)
        // fanOut: the per-row split+filter work otherwise runs inside the
        // single-row-group scan task (r17 sf1 measurement: 1.48 s serial)
        fanOut(documents(s, d))
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(col("doc_id"),
            size(col("words")).as("n_words"),
            size(filter(col("words"), w => array_contains(stops, w)))
              .as("n_stop"))
          .withColumn("stop_ratio",
            round(col("n_stop").cast("double") / col("n_words"), 4))
          .withColumn("lang_guess",
            when(col("stop_ratio") >= 0.05, lit("en")).otherwise(lit("unk")))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws
             |           FROM documents)
             |SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
             |  CAST(len(list_filter(ws, w -> list_contains(
             |    ['the','a','of','and','to','in'], w))) AS INT) AS n_stop,
             |  round(CAST(len(list_filter(ws, w -> list_contains(
             |    ['the','a','of','and','to','in'], w))) AS DOUBLE)
             |    / len(ws), 4) AS stop_ratio,
             |  CASE WHEN round(CAST(len(list_filter(ws, w -> list_contains(
             |    ['the','a','of','and','to','in'], w))) AS DOUBLE)
             |    / len(ws), 4) >= 0.05 THEN 'en' ELSE 'unk' END AS lang_guess
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length / alpha-ratio / word-count composite.
    Q("q44_quality_score",
      // fanOut: the full-text regexp_replace is per-row-heavy (r17 sf1
      // measurement: 1.54 s inside the one scan task)
      (s, d) => fanOut(documents(s, d))
        .select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          size(split(col("text"), " ")).as("n_words"),
          (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
            length(col("text"))).as("alpha_ratio_raw"))
        .select(col("doc_id"), col("n_chars_m"), col("n_words"),
          round(col("alpha_ratio_raw"), 4).as("alpha_ratio"),
          round(least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.5 +
            col("alpha_ratio_raw") * 0.5, 4).as("quality"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(length(text) AS INT) AS n_chars_m,
             |  CAST(len(str_split(text, ' ')) AS INT) AS n_words,
             |  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))
             |    AS DOUBLE) / length(text), 4) AS alpha_ratio,
             |  round(least(CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0,
             |    1.0) * 0.5 +
             |    (CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))
             |     AS DOUBLE) / length(text)) * 0.5, 4) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Token counting: whitespace tokens + BPE-ish regex tokens + chars/4.
    Q("q45_token_count",
      // fanOut: regexp_extract_all over full text is per-row-heavy (r17
      // sf1 measurement: 1.88 s inside the one scan task)
      (s, d) => fanOut(documents(s, d))
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(expr(
            "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .as("re_tokens"),
          ceil(col("n_chars").cast("double") / 4.0).cast("long")
            .as("est_bpe"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(str_split(text, ' ')) AS INT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             |    AS INT) AS re_tokens,
             |  CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Document fingerprint: md5 over the sorted distinct vocabulary —
    // rolling-hash-style content signature, identical in both engines.
    Q("q46_fingerprint",
      // fanOut: per-doc vocab sort + md5 is per-row-heavy (r17 sf1
      // measurement: 1.40 s inside the one scan task)
      (s, d) => fanOut(documents(s, d))
        .select(col("doc_id"),
          sort_array(array_distinct(split(col("text"), " "))).as("vocab"))
        .select(col("doc_id"),
          md5(array_join(col("vocab"), ",")).as("fp"),
          size(col("vocab")).as("n_uniq"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(array_to_string(list_sort(list_distinct(
             |    str_split(text, ' '))), ',')) AS fp,
             |  CAST(len(list_distinct(str_split(text, ' '))) AS INT) AS n_uniq
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // X20 TF-IDF top terms: per-doc argmax of tf·idf, aggregated to
    // (lang, term) → how many docs each term dominates. Raw-idf form
    // (score = tf·N/df, no log): tf·N stays under 2^53 so the division
    // is a single correctly-rounded IEEE op — bit-identical in any
    // engine, unlike ln() whose last ulp is libm-dependent and could
    // flip a near-tie argmax. Ranking is unchanged for fixed tf
    // (1/df and ln(N/df) are both monotone decreasing in df).
    // Scale: tf and df are both partial+final aggs over the exploded
    // token stream (read once); tf⋈df co-shuffles on tok (vocab-sized
    // right side — AQE broadcasts it when small, shuffle-joins when a
    // 100 TB corpus makes the vocab huge); N joins in as a broadcast
    // scalar; the argmax is rn=1 over doc_id → WindowGroupLimit prunes
    // map-side, so the window exchange carries O(1) rows per doc.
    Q("q103_tfidf_topterms",
      (s, d) => {
        val docs = documents(s, d)
        // fanOut: tf's partial agg over the exploded token stream
        // otherwise runs inside the one scan task (r17 sf1: 2.9 s)
        val toks = fanOut(docs).select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        val tf = toks.groupBy("doc_id", "lang", "tok")
          .agg(count(lit(1)).as("tf"))
        // df rides the tf aggregate: tf's grouped output IS the distinct
        // (doc, tok) set, so document frequency is one more partial+final
        // count over it — the raw token stream is exploded and shuffled
        // ONCE, not twice (a second full distinct() pass costs another
        // corpus-sized shuffle at 100 TB).
        val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_total"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("tok").asc)
        tf.join(dfreq, "tok")
          .crossJoin(broadcast(n))
          .withColumn("score",
            (col("tf") * col("n_total")).cast("double") / col("df"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("lang", "tok")
          .agg(count(lit(1)).as("n_docs"))
          .select(col("lang"), col("tok").as("top_term"), col("n_docs"))
          .orderBy(col("lang"), col("n_docs").desc, col("top_term"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks GROUP BY 1, 2, 3),
             |dfreq AS (
             |  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |  FROM toks GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total
             |      FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.lang, tf.tok,
             |    CAST(tf.tf * n.n_total AS DOUBLE) / dfreq.df AS score
             |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
             |top AS (
             |  SELECT doc_id, lang, tok, row_number() OVER (
             |    PARTITION BY doc_id
             |    ORDER BY score DESC, tok ASC) AS rn
             |  FROM scored)
             |SELECT lang, tok AS top_term,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM top WHERE rn = 1
             |GROUP BY 1, 2 ORDER BY lang, n_docs DESC, top_term"""
        .stripMargin)),

    // X21 sketch heavy hitters — approximate token frequencies through the
    // mergeable Count-Min aggregate (ops/CountMin): aggregation state is
    // O(depth·width) regardless of vocabulary, the scale path when the
    // exact (token → count) map no longer fits an executor. Output joins
    // the estimate against the exact count so over-count is visible.
    // FULL oracle since r13 (VERDICT r12 #6): the bucket hash is the
    // md5-tokenHash affine family (ops/CountMin.AB), so DuckDB replays
    // the ENTIRE sketch relationally — per (token, row) buckets, counter
    // = sum of exact counts landing in the bucket, estimate = min over
    // rows — and the dump hash-matches bit-for-bit (the sketch's merge
    // is exact addition, so counters are partition-invariant; CmsSpec
    // keeps the one-sided-error/ε·N/merge properties as engine-side
    // invariants). The candidate probe runs over the vocab-sized exact
    // agg — explicitly not the hot path; the corpus-wide pass is the
    // sketch aggregation itself.
    Q("q106_cms_heavy_hitters",
      (s, d) => {
        import s.implicits._
        import graft.ops.{CountMin, CountMinAggregator}
        // fanOut: local single-row-group parquet would otherwise feed the
        // sketch's partial agg as ONE task — at sf1 that serializes ~6M
        // md5s (the r13 +2 s regression; CLAUDE.md fanOut discipline)
        val toks = fanOut(documents(s, d))
          .select(explode(split(col("text"), " ")).as("value")).as[String]
        // one aggregate row (64 KiB of counters) to the driver — the same
        // contract as any agg result, not a corpus collect.
        val sketch = toks
          .select(new CountMinAggregator().toColumn).head()
        val exact = toks.groupBy("value")
          .agg(count(lit(1)).as("exact_n")).as[(String, Long)]
        exact.map { case (tok, n) =>
          (tok, n, CountMin.estimate(sketch, tok))
        }.toDF("tok", "exact_n", "est_n")
          .orderBy(col("est_n").desc, col("tok").asc)
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
             |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
             |        FROM toks GROUP BY tok),
             |ab(r, a, b) AS (
             |  VALUES (0, 31, 7), (1, 131, 17),
             |         (2, 1031, 97), (3, 8191, 401)),
             |bkt AS (
             |  SELECT tok, exact_n, r,
             |    ((a * (('0x' || substr(md5(tok), 1, 15))::BIGINT
             |           % 1000000007) + b) % 1000000007) % 2048 AS bk
             |  FROM cnt CROSS JOIN ab),
             |counters AS (
             |  SELECT r, bk, CAST(sum(exact_n) AS BIGINT) AS c
             |  FROM bkt GROUP BY r, bk)
             |SELECT tok, min(exact_n) AS exact_n,
             |       CAST(min(c) AS BIGINT) AS est_n
             |FROM bkt JOIN counters USING (r, bk)
             |GROUP BY tok
             |ORDER BY est_n DESC, tok ASC LIMIT 20""".stripMargin)),

    // X99 SpaceSaving topK heavy hitters — ClickHouse topK parity
    // (ops/SpaceSaving): the CMS (q106) answers point-frequency probes
    // but needs the exact vocab map to ENUMERATE heavy hitters;
    // SpaceSaving maintains the top-k SET itself in capacity-M bounded
    // state (M=64 here, k=10). Output: rank, token, the over-counting
    // estimate, its error bound, and the GUARANTEED flag — true when
    // est − err strictly exceeds the (k+1)-th estimate, which certifies
    // membership in every true top-k set (the Metwally et al. 2005
    // guarantee; see SpaceSaving's invariant scaladoc). Bounds-gated,
    // not hash-oracled: summary CONTENTS are stream-order-dependent
    // (unlike the CMS's exact counters), but the bounds and the
    // guaranteed claims hold under every partitioning — verify_local
    // checks est ≥ exact ≥ est − err per reported token and replays
    // every guaranteed membership against exact DuckDB counts;
    // SpaceSavingSpec pins partition invariance of the claims and
    // exactness when the vocabulary fits the capacity.
    // Scale shape: one token explode behind fanOut → the typed
    // aggregator's partial+final fold — executors exchange 64-entry
    // summaries, never token streams; the top-10 cut runs on the one
    // 64-entry aggregate row. The exact vocab map is never built.
    Q("q214_topk_spacesaving",
      (s, d) => {
        import s.implicits._
        import graft.ops.{SpaceSaving, SpaceSavingAggregator}
        val toks = fanOut(documents(s, d))
          .select(explode(split(col("text"), " ")).as("value")).as[String]
        val summary: Seq[SpaceSaving.Entry] = toks
          .select(new SpaceSavingAggregator(64).toColumn).head()
        val k = 10
        val thresh = if (summary.size > k) summary(k).c else 0L
        val top = summary.take(k).zipWithIndex.map { case (en, i) =>
          (i + 1, en.tok, en.c, en.e, en.c - en.e > thresh)
        }
        s.createDataFrame(top)
          .toDF("rank", "token", "est", "err", "guaranteed")
          .orderBy("rank")
      },
      None),

    // X101 weighted SpaceSaving topK — ClickHouse `topKWeighted` parity
    // (the other half of X99's pair): counters accumulate WEIGHT mass,
    // here exact cents of event value per user — "which users carry the
    // most value" maintained in capacity-64 bounded state over a user
    // space that exceeds it (150 users at sf0.01, 1 500 at sf1). Same
    // invariants with "count" read as "total weight"; same
    // mergeable-summaries merge; same bounds gate (verify_local replays
    // exact per-user cents sums in DuckDB and checks the est/err window
    // plus every guaranteed top-10 membership). Weights are
    // Scalars.cents longs — exact integer mass, no float accumulation.
    // Scale shape: one narrow (user, cents) projection — no explode, no
    // text — into the typed aggregator's partial+final fold; executors
    // exchange 64-entry summaries. The exact per-user sum table is
    // never built.
    Q("q217_topk_weighted",
      (s, d) => {
        import s.implicits._
        import graft.ops.{SpaceSaving, WeightedSpaceSavingAggregator}
        val rows = events(s, d)
          .select(col("user_id").cast("string"),
            Scalars.cents(col("value")))
          .as[(String, Long)]
        val summary: Seq[SpaceSaving.Entry] = rows
          .select(new WeightedSpaceSavingAggregator(64).toColumn).head()
        val k = 10
        // the certification threshold is DUMPED so the gate can replay
        // the flag (guaranteed == est − err > thresh) and check the
        // threshold's own soundness: every user OUTSIDE the reported
        // top-k has true mass ≤ thresh (I2 + the (k+1)-th bound). On a
        // near-uniform mass distribution no guarantee may fire — that is
        // SpaceSaving answering honestly, and the gate verifies the
        // honesty instead of demanding a certificate the data can't give.
        val thresh = if (summary.size > k) summary(k).c else 0L
        val top = summary.take(k).zipWithIndex.map { case (en, i) =>
          (i + 1, en.tok, en.c, en.e, thresh, en.c - en.e > thresh)
        }
        s.createDataFrame(top)
          .toDF("rank", "user_id", "est_cents", "err", "thresh",
            "guaranteed")
          .orderBy("rank")
      },
      None),

    // X48 tokenizer vocabulary coverage / OOV rate — the tokenizer-fit
    // audit run before training: fix a vocabulary (here the corpus's own
    // top-64 tokens by (freq DESC, token ASC) — the deterministic stand-in
    // for a shipped tokenizer's vocab file) and report, per source, the
    // fraction of token occurrences falling outside it, as exact ppm fixed
    // point. High OOV in a source means the tokenizer fragments its text
    // into bytes/unknowns — the signal used to re-weight or re-train.
    // Scale shape (q103's read-once discipline): the token stream is
    // exploded and aggregated ONCE into (source, tok) counts — partial
    // map-side combine, vocab×sources-bounded output; the vocab is its
    // tok-marginal (one more partial agg) reduced via TakeOrdered (never a
    // global sort) and re-joined BROADCAST (64 rows) onto the same
    // aggregate, which Spark reuses (ReusedExchange, plan-gated) — the
    // corpus is scanned and shuffled exactly once.
    Q("q136_vocab_coverage",
      (s, d) => {
        // (source, tok) counts materialized ONCE (localCheckpoint stands in
        // for the production parquet write of the aggregate, as in
        // DedupPipeline.run): both the vocab fit and the coverage probe
        // read the vocab×sources-sized table — the corpus token stream is
        // exploded and aggregated exactly once (plan-gated: the declared
        // plan contains no second corpus explode).
        val st = documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        val vocab = st.groupBy("tok").agg(sum("n").as("freq"))
          .orderBy(col("freq").desc, col("tok").asc).limit(64)
          .select(col("tok"), lit(1).as("iv"))
        st.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("source")
          .agg(sum("n").as("n_tok"),
            sum(when(col("iv").isNull, col("n")).otherwise(0L))
              .as("oov_tok"))
          .withColumn("oov_ppm", expr("(1000000L * oov_tok) DIV n_tok"))
          .orderBy("source")
      },
      Some("""WITH st AS (
             |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n
             |  FROM (SELECT source, unnest(str_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2),
             |vocab AS (SELECT tok FROM (
             |  SELECT tok, CAST(row_number() OVER (
             |    ORDER BY sum(n) DESC, tok ASC) AS INT) AS rk
             |  FROM st GROUP BY tok) WHERE rk <= 64),
             |cov AS (
             |  SELECT st.source, st.n,
             |         CASE WHEN v.tok IS NULL THEN st.n ELSE 0 END AS oov
             |  FROM st LEFT JOIN vocab v ON v.tok = st.tok)
             |SELECT source, CAST(sum(n) AS BIGINT) AS n_tok,
             |       CAST(sum(oov) AS BIGINT) AS oov_tok,
             |       CAST((1000000 * sum(oov)) // sum(n) AS BIGINT)
             |         AS oov_ppm
             |FROM cov GROUP BY source ORDER BY source""".stripMargin)),

    // X36 BPE merge-pair mining — the statistic the byte-pair-encoding
    // tokenizer-training loop maximizes each iteration (Sennrich et al.
    // 2016): over the corpus, the frequency of every adjacent symbol pair
    // inside words, weighted by word frequency; the argmax pair becomes
    // the next merge. Graded here is the first iteration's pair table
    // (symbol alphabet = raw characters), which is also the expensive one
    // — later iterations run on the same shape with a rewritten symbol
    // column. The pipeline placement: tokenizer training runs over the
    // SAME corpus the curation pipeline just deduped, so this is a
    // first-class curation-output consumer.
    // Scale shape — dedup-before-expensive-work (q119's composition,
    // applied to words): pair extraction runs over the DISTINCT word
    // table (vocabulary-sized, Heaps'-law sublinear in the corpus), each
    // word weighted by its corpus frequency — never over the token
    // stream. Two exchanges total: the word-frequency agg (partial count
    // map-side, fixed ~word-sized keys) and the pair agg (partial sum,
    // 2-char keys, alphabet²-bounded cardinality). Both shrink before
    // they shuffle; nothing pairwise, no window. At 100 TB the token
    // explode is the only corpus-proportional stage and it is map-only
    // into a combiner.
    Q("q124_bpe_pair_mining",
      (s, d) => {
        val words = fanOut(documents(s, d))
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
        words
          .filter(length(col("word")) >= 2)
          .select(col("freq"), explode(
            expr("transform(sequence(1, length(word) - 1), " +
              "i -> substring(word, i, 2))")).as("pair"))
          .groupBy("pair").agg(sum("freq").as("merge_count"))
          .orderBy(col("merge_count").desc, col("pair").asc)
          .limit(20)
      },
      Some("""WITH words AS (
             |  SELECT word, CAST(count(*) AS BIGINT) AS freq
             |  FROM (SELECT unnest(str_split(text, ' ')) AS word
             |        FROM documents)
             |  GROUP BY 1),
             |pairs AS (
             |  SELECT freq, unnest(list_transform(
             |    range(1, length(word)),
             |    i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
             |  FROM words WHERE length(word) >= 2)
             |SELECT pair, CAST(sum(freq) AS BIGINT) AS merge_count
             |FROM pairs GROUP BY 1
             |ORDER BY merge_count DESC, pair LIMIT 20""".stripMargin)),

    // X37 n-gram LM fluency scoring — the perplexity-style quality signal
    // (CCNet/Gopher filter on a small LM's score; Wenzek et al. 2020).
    // The learned-model complement DIFFERENT from q120 (hashing-trick
    // classifier: per-token weights, no context) and q123 (BM25: scores
    // docs against a query): here the model is a bigram transition table
    // TRAINED ON THE CORPUS ITSELF in the same job, and each doc is
    // scored by its mean transition probability — repeated/templated text
    // scores high, token-salad scores low. Semantics kept exact:
    // P(r|l) = c(l,r)/c(l·) as the BIGINT fixed point (1e9·c12) DIV c1
    // (integer floor division, no libm, no IEEE accumulation), so the
    // per-doc sum Σ tf·p_fp is an exact BIGINT — q123's discipline.
    // Scale shape: THREE aggs and ONE equi-join, nothing pairwise —
    // (1) per-doc bigram tf (the only corpus-proportional explode,
    // map-only into a combiner); (2) model c12 = Σ tf derived FROM the tf
    // table (q103's df-from-tf lesson — one corpus explode total, the
    // exchange is reused); (3) c1 = Σ c12 over the left token
    // (vocab-sized input). The scoring join (doc bigrams ⋈ model) is an
    // equi-join on the pair string — vocab²-bounded model side, SMJ at
    // scale, never a nested loop; the model is NOT collected or
    // broadcast-by-hand because at 100 TB it outgrows the driver.
    Q("q125_lm_score",
      (s, d) => bigramDocScores(s, d).orderBy("doc_id"),
      Some(s"""WITH $bigramScoreSqlCtes
             |SELECT doc_id, n_bigrams, score_fp
             |FROM lmsc ORDER BY doc_id""".stripMargin)),

    // X56 CCNet-style per-language fluency bucketing (Wenzek et al. 2020):
    // docs split into head/middle/tail TERTILES of the LM score WITHIN
    // their language — the standard curation move that keeps perplexity
    // comparable across languages instead of letting high-resource
    // languages crowd out the head. Score = q144's length-normalized mean
    // bigram probability (score_fp DIV n_bigrams — exact BIGINT, q125's
    // fixed point). Bucketing is BY VALUE: every doc with the same
    // (lang, avg_fp) lands in the same bucket (ties never straddle a
    // boundary, so the result is independent of any tie order), with the
    // boundary rule 3·n_before < n / < 2n over docs strictly better.
    // Scale shape — NO corpus-sized window anywhere: (1) per-doc scores
    // (q125's three aggs + one equi-join); (2) aggregate to the DISTINCT
    // (lang, avg_fp) value table; (3) cumulative doc counts over that
    // table via ops/GlobalRank.prefixSum on the composite key
    // lidx·2^32 + (2^32−1−avg_fp) — range-partitioned, every stage
    // parallel (the q86 primitive); (4) per-lang offsets from the
    // languages-cardinality totals table via a tiny non-equi self-join
    // (no window, no index collect); (5) rollup to (lang, bucket).
    Q("q144_ccnet_buckets",
      (s, d) => {
        import graft.ops.GlobalRank
        val scored = bigramDocScores(s, d)
          .withColumn("avg_fp", expr("score_fp DIV n_bigrams"))
          .join(documents(s, d).select("doc_id", "lang"), "doc_id")
        // materialized ONCE (localCheckpoint = the production write of the
        // per-language score-distribution table): the prefix sum (an RDD
        // subtree that cannot share exchanges), the per-lang totals, and
        // the final bucket join all read this value table — the corpus is
        // scored exactly once. Cardinality is value-space-bounded
        // (≤ distinct avg_fp values), never corpus-sized.
        val byVal = scored.groupBy("lang", "avg_fp")
          .agg(count(lit(1)).as("n_v"), sum("n_bigrams").as("vol"))
          .localCheckpoint(true)
        val langs = byVal.select("lang").distinct()
        val langIdx = langs.as("a")
          .join(langs.as("b"), col("b.lang") < col("a.lang"), "left")
          .groupBy(col("a.lang").as("lang"))
          .agg(count(col("b.lang")).as("lidx"))
        val keyed = byVal.join(broadcast(langIdx), "lang")
          .withColumn("key",
            expr("lidx * 4294967296L + (4294967295L - avg_fp)"))
        val ps = GlobalRank.prefixSum(keyed, col("key"), col("n_v"))
          .select(col("k"), col("cum_before"))
        val totals = keyed.groupBy("lang", "lidx")
          .agg(sum("n_v").as("n"))
        val offsets = totals.as("a")
          .join(totals.as("b"), col("b.lidx") < col("a.lidx"), "left")
          .groupBy(col("a.lang").as("lang"), col("a.n").as("n"))
          .agg(coalesce(sum(col("b.n")), lit(0L)).as("off"))
        keyed.join(ps, col("key") === col("k"))
          .join(broadcast(offsets), "lang")
          .withColumn("n_before", col("cum_before") - col("off"))
          .withColumn("bucket",
            when(col("n_before") * 3 < col("n"), "head")
              .when(col("n_before") * 3 < col("n") * 2, "middle")
              .otherwise("tail"))
          .groupBy("lang", "bucket")
          .agg(sum("n_v").as("n_docs"), sum("vol").as("n_bigrams"),
            min("avg_fp").as("min_fp"), max("avg_fp").as("max_fp"))
          .orderBy("lang", "bucket")
      },
      Some(s"""WITH $bigramScoreSqlCtes,
             |sc AS (
             |  SELECT l2.doc_id, dd.lang, l2.n_bigrams,
             |         l2.score_fp // l2.n_bigrams AS avg_fp
             |  FROM lmsc l2 JOIN documents dd USING (doc_id)),
             |v AS (
             |  SELECT lang, avg_fp, CAST(count(*) AS BIGINT) AS n_v,
             |         CAST(sum(n_bigrams) AS BIGINT) AS vol
             |  FROM sc GROUP BY 1, 2),
             |w AS (
             |  SELECT lang, avg_fp, n_v, vol,
             |    CAST(sum(n_v) OVER (PARTITION BY lang) AS BIGINT) AS n,
             |    CAST(coalesce(sum(n_v) OVER (PARTITION BY lang
             |      ORDER BY avg_fp DESC ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS BIGINT) AS n_before
             |  FROM v)
             |SELECT lang,
             |  CASE WHEN 3 * n_before < n THEN 'head'
             |       WHEN 3 * n_before < 2 * n THEN 'middle'
             |       ELSE 'tail' END AS bucket,
             |  CAST(sum(n_v) AS BIGINT) AS n_docs,
             |  CAST(sum(vol) AS BIGINT) AS n_bigrams,
             |  CAST(min(avg_fp) AS BIGINT) AS min_fp,
             |  CAST(max(avg_fp) AS BIGINT) AS max_fp
             |FROM w GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin)),

    // X40 split-leakage audit — the check every train/val/test split needs
    // AFTER near-dup detection: a pair of near-duplicate documents whose
    // members land in different hash-split partitions (q85's rule) leaks
    // evaluation content into training. Candidates come from the SAME LSH
    // band index the dedup tier maintains (bandPairs — never pairwise),
    // so the audit is: candidate pairs ⋈ split labels, keep straddlers.
    // Scale: the banded candidate set is duplicate-density-sized (tiny
    // relative to the corpus), so it broadcasts to the split-label join —
    // the corpus itself is scanned once for labels (a narrow doc_id
    // projection; the split is a pure content-hash function, q85) and
    // never shuffled. Candidates probe the PERSISTED band index
    // (DedupPipeline.cachedFold — the same LayoutCache artifact q112
    // dumps and q115 consumes), so the audit is the incremental form it
    // documents: NO corpus re-shingle anywhere in the plan (PlanSpec
    // gate); per-audit cost is the index self-join + one narrow label
    // scan.
    Q("q128_split_leakage",
      (s, d) => {
        val splits = documents(s, d).select(col("doc_id"),
          when(QueriesCuration.bucket("split:") < 80, "train")
            .when(QueriesCuration.bucket("split:") < 90, "val")
            .otherwise("test").as("split"))
        val pairs = bandPairsFrom(
          graft.pipelines.DedupPipeline.cachedFold(s, d).bands)
        splits.select(col("doc_id").as("a_id"), col("split").as("a_split"))
          .join(broadcast(pairs), Seq("a_id"))
          .join(splits.select(col("doc_id").as("b_id"),
            col("split").as("b_split")), Seq("b_id"))
          .filter(col("a_split") =!= col("b_split"))
          .select("a_id", "b_id", "a_split", "b_split")
          .orderBy("a_id", "b_id")
      },
      Some {
        def h(i: Int): String = minhashSqlExpr(
          MinhashAB(i)._1, MinhashAB(i)._2)
        val splitCase =
          s"""CASE WHEN ${QueriesCuration.bucketSql("split:")} < 80
             |     THEN 'train'
             |     WHEN ${QueriesCuration.bucketSql("split:")} < 90
             |     THEN 'val' ELSE 'test' END""".stripMargin
        s"""WITH t AS (SELECT doc_id, $shinglesSql AS ws FROM documents),
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
           |sp AS (SELECT doc_id, $splitCase AS split FROM documents)
           |SELECT p.a_id, p.b_id, sa.split AS a_split, sb.split AS b_split
           |FROM pairs p
           |JOIN sp sa ON sa.doc_id = p.a_id
           |JOIN sp sb ON sb.doc_id = p.b_id
           |WHERE sa.split <> sb.split
           |ORDER BY a_id, b_id""".stripMargin
      }),

    // X50 per-source dataset card — the datasheet every released corpus
    // ships (Gebru et al. 2021 "Datasheets for Datasets"; the FineWeb/
    // Dolma model cards): one panel per source with volume (docs, ws
    // tokens), quality (mean of q44's score as exact ppm fixed point —
    // floor(1e6·q) per doc, integer sum, integer mean: no accumulation-
    // order-dependent double mean), exact-duplicate density (docs whose
    // full text recurs corpus-wide, ppm), and near-dup cluster membership
    // density (docs paired in the maintained dedup index, ppm). The
    // card is the downstream consumer every curation stage feeds.
    // Scale shape: ONE corpus scan computes all per-doc measures
    // map-side; the recurrence flag is a window over the 32-byte sha2
    // (never raw text through the exchange — q40's lesson); membership
    // is one left join against the PERSISTED index labels
    // (cachedFold — no closure rebuild, plan-gated); the rollup is a
    // partial agg over sources-many groups.
    Q("q138_dataset_card",
      (s, d) => {
        val qd = documents(s, d).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          floor(lit(1e6) *
            (least(size(split(col("text"), " ")).cast("double") / 100.0,
              lit(1.0)) * 0.5 +
             length(regexp_replace(col("text"), "[^a-z]", ""))
               .cast("double") / length(col("text")) * 0.5)).as("q_fp"),
          sha2(col("text"), 256).as("t_h"))
        val wd = Window.partitionBy("t_h")
        val labels = graft.pipelines.DedupPipeline.cachedFold(s, d).labels
          .select(col("v").as("doc_id"), lit(1).as("cl"))
        qd.withColumn("n_copy", count(lit(1)).over(wd))
          .join(labels, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").as("n_tokens"),
            sum("q_fp").as("q_sum"),
            sum(when(col("n_copy") >= 2, 1L).otherwise(0L)).as("dup_docs"),
            sum(when(col("cl").isNotNull, 1L).otherwise(0L))
              .as("clustered_docs"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            expr("q_sum DIV n_docs").as("mean_q_ppm"),
            expr("(1000000L * dup_docs) DIV n_docs").as("dup_ppm"),
            expr("(1000000L * clustered_docs) DIV n_docs")
              .as("clustered_ppm"))
          .orderBy("source")
      },
      Some {
        val qFp = "CAST(floor(1e6 * (" +
          "least(CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)" +
          " * 0.5 + (CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))" +
          " AS DOUBLE) / length(text)) * 0.5)) AS BIGINT)"
        s"""WITH RECURSIVE
           |$closureSqlCtes,
           |qd AS (
           |  SELECT doc_id, source,
           |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
           |    $qFp AS q_fp,
           |    count(*) OVER (PARTITION BY text) AS n_copy
           |  FROM documents),
           |m AS (
           |  SELECT qd.*, CASE WHEN c.v IS NULL THEN 0 ELSE 1 END AS cl
           |  FROM qd LEFT JOIN comp c ON c.v = qd.doc_id)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |  CAST(sum(q_fp) // count(*) AS BIGINT) AS mean_q_ppm,
           |  CAST((1000000 * sum(CASE WHEN n_copy >= 2 THEN 1 ELSE 0 END))
           |    // count(*) AS BIGINT) AS dup_ppm,
           |  CAST((1000000 * sum(cl)) // count(*) AS BIGINT)
           |    AS clustered_ppm
           |FROM m GROUP BY source ORDER BY source""".stripMargin
      }),

    // X65 quality × duplication contingency — the evidence table behind
    // the "dedup before or after the quality filter?" pipeline-ordering
    // decision (and the sanity check on the quality score itself): per
    // 0.1-wide quality bin (X50's exact fixed-point formula), document
    // count and the fraction belonging to a near-dup cluster in the
    // MAINTAINED index, as exact ppm. If duplication concentrates in low
    // bins, the quality filter already removes most duplicates and dedup
    // can run on the survivors (cheaper); flat rates mean dedup must run
    // first or the filter keeps whole duplicate families.
    // Scale shape: score + bin are map-side over one corpus scan;
    // membership is one left join against the PERSISTED index labels
    // (cachedFold — no closure rebuild); the rollup is a partial agg to
    // ~10 bins. Nothing pairwise, nothing windowed.
    Q("q153_quality_dup_matrix",
      (s, d) => {
        val qd = documents(s, d).select(col("doc_id"),
          floor(lit(1e6) *
            (least(size(split(col("text"), " ")).cast("double") / 100.0,
              lit(1.0)) * 0.5 +
             length(regexp_replace(col("text"), "[^a-z]", ""))
               .cast("double") / length(col("text")) * 0.5)).as("q_fp"))
          .withColumn("bin", expr("q_fp DIV 100000L"))
        val labels = graft.pipelines.DedupPipeline.cachedFold(s, d).labels
          .select(col("v").as("doc_id"), lit(1).as("cl"))
        qd.join(labels, Seq("doc_id"), "left")
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("cl").isNotNull, 1L).otherwise(0L))
              .as("n_clustered"))
          .withColumn("clustered_ppm",
            expr("(1000000L * n_clustered) DIV n_docs"))
          .select("bin", "n_docs", "n_clustered", "clustered_ppm")
          .orderBy("bin")
      },
      Some {
        val qFp = "CAST(floor(1e6 * (" +
          "least(CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)" +
          " * 0.5 + (CAST(length(regexp_replace(text, '[^a-z]', '', 'g'))" +
          " AS DOUBLE) / length(text)) * 0.5)) AS BIGINT)"
        s"""WITH RECURSIVE
           |$closureSqlCtes,
           |qd AS (
           |  SELECT doc_id, $qFp // 100000 AS bin
           |  FROM documents),
           |m AS (
           |  SELECT qd.bin, CASE WHEN c.v IS NULL THEN 0 ELSE 1 END AS cl
           |  FROM qd LEFT JOIN comp c ON c.v = qd.doc_id)
           |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(cl) AS BIGINT) AS n_clustered,
           |  CAST((1000000 * sum(cl)) // count(*) AS BIGINT)
           |    AS clustered_ppm
           |FROM m GROUP BY bin ORDER BY bin""".stripMargin
      }),

    // X73 positional phrase search — the retrieval primitive behind
    // "find every document containing this exact phrase": the corpus's
    // top trigram is mined first (the phrase is DATA-derived for
    // reproducibility — occurrence count over distinct texts, gram-asc
    // tiebreak), then every document containing it is reported with its
    // per-document occurrence count. Both stages consume ONE stride-1
    // per-doc trigram stream (q150's lead-window machinery) built over
    // DISTINCT CONTENT and localCheckpointed once; verbatim copies get
    // their counts back through the content-hash fan-out join (the
    // copy-invariant rule — at sf1 the stream is 10× smaller than the
    // corpus). All aggregation keys are the 8-byte md5 token hash (the
    // gram text rides as a min() measure); the match is a 1-row
    // broadcast equi-join against the stream — never a corpus-wide
    // LIKE/contains scan, which cannot use an index and re-reads every
    // byte of text per phrase.
    Q("q172_phrase_search",
      (s, d) => {
        val withH = documents(s, d).select(col("doc_id"),
          sha2(col("text"), 256).as("h"))
        val dtext = documents(s, d).select(col("text")).distinct()
          .select(sha2(col("text"), 256).as("h"), col("text"))
        // trigrams MAP-SIDE (the q87 slice-transform idiom; the lead
        // window paid an exchange+sort of the token stream — guide §2.4)
        val grams = fanOut(dtext)
          .select(col("h"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("h"), explode(expr(
            "transform(sequence(1, size(t) - 2), " +
              "i -> concat_ws(' ', slice(t, i, 3)))")).as("gram"))
          .withColumn("g", Scalars.tokenHash(col("gram")) % P)
          .localCheckpoint(true)
        val top = grams.groupBy("g")
          .agg(count(lit(1)).as("n_occ"), min("gram").as("gram"))
          .orderBy(col("n_occ").desc, col("gram").asc).limit(1)
        val hits = grams.join(broadcast(top.select("g")), "g")
          .groupBy("h").agg(count(lit(1)).as("n_occ"))
        withH.join(hits, "h")
          .crossJoin(broadcast(top.select("gram")))
          .select(col("doc_id"), col("gram"), col("n_occ"))
          .orderBy("doc_id")
      },
      Some(s"""WITH dt AS (SELECT DISTINCT text FROM documents),
              |t AS (SELECT text, str_split(text, ' ') AS toks FROM dt),
              |g AS (
              |  SELECT text,
              |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              |  FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
              |  WHERE len(toks) >= 3),
              |h AS (
              |  SELECT text, gram,
              |    (('0x' || substr(md5(gram), 1, 15))::BIGINT % $P) AS gg
              |  FROM g),
              |top AS (
              |  SELECT gg, CAST(count(*) AS BIGINT) AS n_occ,
              |    min(gram) AS gram
              |  FROM h GROUP BY 1
              |  ORDER BY n_occ DESC, gram LIMIT 1),
              |hits AS (
              |  SELECT h.text, CAST(count(*) AS BIGINT) AS n_occ
              |  FROM h JOIN top USING (gg) GROUP BY 1)
              |SELECT d.doc_id, top.gram, hits.n_occ
              |FROM documents d
              |JOIN hits ON hits.text = d.text
              |CROSS JOIN top
              |ORDER BY d.doc_id""".stripMargin)),

    // X81 corpus novelty curve — per ingest batch (the q112 doc_id%3
    // batch stand-in for daily crawls), the fraction of the batch's
    // DISTINCT shingles never seen in any earlier batch: the signal a
    // crawl-ops team watches to decide when a source is mined out
    // (novelty → 0 means new crawls re-fetch old content; the
    // batch-axis complement of X64's source-axis novelty). Integer
    // counts + ppm via DIV.
    // Scale shape: per-doc shingles are map-side; everything reduces
    // through ONE exchange keyed on the shingle hash — the (shingle,
    // batch)-distinct agg and the per-shingle first-batch min both run
    // on that partitioning (q152's single-exchange contract); the
    // rollup is batches-many rows. Shingle TEXT never shuffles (8-byte
    // tokenHash keys, collision-merged identically in both engines).
    Q("q185_novelty_curve",
      (s, d) => {
        // fanOut: local single-row-group parquet scans are 1 task and
        // the shingle explode is per-row-heavy (the q150/q166 lesson)
        val byH = fanOut(documents(s, d))
          .select((col("doc_id") % 3).as("batch"),
            explode(Scalars.shingles3Text(col("text"))).as("sh"))
          .select(col("batch"), (Scalars.tokenHash(col("sh")) % P).as("h"))
          // ONE h-keyed exchange: the ≤3-element batch set per shingle
          // replaces distinct + first-batch agg + join (3 exchanges)
          .groupBy("h").agg(collect_set(col("batch")).as("batches"))
        byH.select(array_min(col("batches")).as("first_batch"),
            explode(col("batches")).as("batch"))
          .groupBy("batch")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_batch") === col("batch"), 1L)
              .otherwise(0L)).as("n_new"))
          .select(col("batch"), col("n_shingles"), col("n_new"),
            expr("(1000000 * n_new) DIV n_shingles").as("novelty_ppm"))
          .orderBy("batch")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id % 3 AS batch, $shinglesSql AS ws
              |  FROM documents),
              |sb AS (
              |  SELECT DISTINCT batch,
              |    (('0x' || substr(md5(s.sh), 1, 15))::BIGINT % $P) AS h
              |  FROM t, unnest(ws) AS s(sh)),
              |f AS (SELECT h, min(batch) AS first_batch FROM sb GROUP BY h)
              |SELECT sb.batch, CAST(count(*) AS BIGINT) AS n_shingles,
              |  CAST(sum(CASE WHEN f.first_batch = sb.batch THEN 1
              |    ELSE 0 END) AS BIGINT) AS n_new,
              |  CAST((1000000 * sum(CASE WHEN f.first_batch = sb.batch
              |    THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
              |    AS novelty_ppm
              |FROM sb JOIN f USING (h)
              |GROUP BY sb.batch ORDER BY sb.batch""".stripMargin)),

    // X89 token-diversity quality gate — the Gini–Simpson index
    // 1 − Σp², the EXACT-integer complement of the entropy/perplexity
    // signals (X37's LM score needs float logs; Simpson needs only
    // squares, so both engines compute it bit-identically): per doc,
    // gs_ppm = 1e6 − (1e6·Σc²) DIV N² over token counts c — 0 for a
    // one-token-repeated doc, →1e6 for all-distinct tokens. Low
    // diversity flags templated/degenerate text the length/stopword
    // heuristics (X4/X6) miss. Per source: docs, exact mean, and the
    // count below the 0.5 gate — the per-source yield a cleanup run
    // reads. Exactness window: 1e6·Σc² ≤ 1e6·N² stays in long for
    // N < 3e6 tokens/doc (a 3M-token doc is ~20 MB of text — beyond
    // any sane document contract; chunk first (X12/X39) if not).
    // Scale shape: one token explode behind fanOut → (source, doc, th)
    // partial+final agg on 8-byte hashes (collisions merge identically
    // in both engines) → per-doc agg → sources-many rollup. No windows,
    // no joins, every agg map-side combinable.
    Q("q198_token_diversity",
      (s, d) => {
        val counts = fanOut(documents(s, d))
          .select(col("source"), col("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
          .select(col("source"), col("doc_id"),
            (Scalars.tokenHash(col("tok")) % P).as("th"))
          .groupBy("source", "doc_id", "th")
          .agg(count(lit(1)).as("c"))
        val perDoc = counts.groupBy("source", "doc_id")
          .agg(sum("c").as("n"),
            sum(col("c") * col("c")).as("sq"))
          .select(col("source"),
            (lit(1000000L) - expr("(1000000 * sq) DIV (n * n)"))
              .as("gs"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            expr("sum(gs) DIV count(1)").as("mean_gs_ppm"),
            sum(when(col("gs") < 500000L, 1L).otherwise(0L))
              .as("n_low_diversity"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
              |  SELECT source, doc_id,
              |    unnest(str_split(text, ' ')) AS tok
              |  FROM documents),
              |cnt AS (
              |  SELECT source, doc_id, (${tokSql("tok")} % $P) AS th,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM toks GROUP BY 1, 2, 3),
              |per_doc AS (
              |  SELECT source,
              |    1000000 - (1000000 * CAST(sum(c * c) AS BIGINT))
              |      // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT))
              |      AS gs
              |  FROM cnt GROUP BY source, doc_id)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(gs) // count(*) AS BIGINT) AS mean_gs_ppm,
              |  CAST(sum(CASE WHEN gs < 500000 THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_low_diversity
              |FROM per_doc GROUP BY source ORDER BY source""".stripMargin)),

    // X91 BPE-encode APPLY — the missing half of the tokenizer tier
    // (Sennrich et al. 2016): X36/q124 MINES merge pairs, X48/q136 audits
    // vocabulary fit; this APPLIES a merge list to the corpus and reports
    // the real compression curve — per merge round: the merged token, the
    // corpus token count after the round, and how many occurrences the
    // merge absorbed. The merge table is data-derived (q124's
    // first-iteration pair statistic, top-8 by (count DESC, pair ASC)),
    // RESTRICTED TO DISTINCT-CHAR PAIRS: with l != r, matches of (l, r)
    // can never chain (a match at i forces sym(i+1) = r != l, so no match
    // at i+1), making greedy left-to-right application a SINGLE relational
    // pass — no run-parity bookkeeping — and each merge's matches are
    // exhausted in its own round (merged symbols are 2 chars, so they can
    // never recreate a single-char adjacency for an earlier pair).
    // Priority semantics are real BPE: round r's merge consumes symbols
    // before round r+1 sees them (BpeEncodeInvariantSpec pins a pair
    // whose result differs under swapped priority).
    // Scale shape — dedup-before-expensive-work (q124's contraction):
    // everything runs over the DISTINCT word table weighted by corpus
    // frequency (vocabulary-sized, Heaps'-law sublinear), never the token
    // stream; the only corpus-proportional stage is the word-frequency
    // agg (map-side combinable). The merge table reaches rounds as a
    // broadcast 1-row scalar (never collected to the driver); rounds with
    // no rk-r row degrade to identity via never-matching sentinel chars
    // (U+0001/U+0002 — not producible by the documents generator).
    // r17 (guide §1.2, the q210 linear-chain analysis carried to its
    // conclusion): the 8 rounds fuse into ONE job of chained
    // word-partitioned windows (8 mid-chain eager checkpoints gone), and
    // ALL nine per-round stats come from ONE aggregate over the FINAL
    // round-8 table instead of nine per-round jobs. Sound because merged
    // symbols are inert once created: every merge pair has distinct
    // single chars, so a 2-char merged symbol can never equal a later
    // round's ml/mr (single chars) — it is neither consumed nor rewritten
    // downstream — and all 8 mtok strings are distinct (distinct pairs,
    // char-concat injective). Hence count(sym = mtok_r) is identical in
    // s_r and s_8 (merge_occ), and corpus_tokens after round r = the
    // round-8 total + Σ_{k>r} merge_occ_k (each round-k merge removed
    // exactly one row per occurrence). BpeEncodeInvariantSpec pins the
    // equivalence against the literal per-round replay.
    Q("q201_bpe_encode",
      (s, d) => {
        val words = fanOut(documents(s, d))
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) >= 1)
          .groupBy("word").agg(count(lit(1)).as("freq"))
          .localCheckpoint(true) // read by the merge miner AND round 0
        val merges = bpeMineMerges(words, 8).localCheckpoint(true)
        var syms = words
          .select(col("word"), col("freq"),
            posexplode(expr(
              "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
          .toDF("word", "freq", "pos", "sym")
        for (r <- 1 to 8)
          syms = bpeRound(syms, bpeMergeRow(merges, r))
        // one cut after the chain (lineage truncation; also the one
        // materialization the stats pass below re-reads)
        syms = syms.localCheckpoint(true)
        // rank-r merge tokens as one broadcast row ('' when rank absent,
        // exactly bpeMergeRow's sentinel-degenerate mtok)
        val mtokCols = (1 to 8).map(r => coalesce(max(when(col("rk") === r,
          col("pair"))), lit("")).as(s"m$r"))
        val mtoks = merges.groupBy().agg(mtokCols.head, mtokCols.tail: _*)
        val occAggs: Seq[org.apache.spark.sql.Column] =
          sum(col("freq")).as("t8") +:
            (1 to 8).map(r => sum(when(col("sym") === col(s"m$r"),
              col("freq")).otherwise(lit(0L))).as(s"occ$r"))
        val a = syms.crossJoin(broadcast(mtoks))
          .groupBy().agg(occAggs.head, occAggs.tail: _*)
          .crossJoin(broadcast(mtoks))
        def tokensAfter(r: Int): org.apache.spark.sql.Column =
          (r + 1 to 8).map(k => col(s"occ$k")).foldLeft(col("t8"))(_ + _)
        val rows = struct(lit(0).as("round"), lit("").as("merge_tok"),
            tokensAfter(0).as("corpus_tokens"), lit(0L).as("merge_occ")) +:
          (1 to 8).map(r => struct(lit(r).as("round"),
            col(s"m$r").as("merge_tok"),
            tokensAfter(r).as("corpus_tokens"),
            col(s"occ$r").as("merge_occ")))
        a.select(explode(array(rows: _*)).as("f"))
          .select(col("f.round").as("round"),
            col("f.merge_tok").as("merge_tok"),
            col("f.corpus_tokens").as("corpus_tokens"),
            col("f.merge_occ").as("merge_occ"))
          .orderBy("round")
      },
      Some {
        val stats = (1 to 8).map { r =>
          s"""st$r AS (SELECT CAST($r AS INT) AS round,
             |  max(m.mtok) AS merge_tok,
             |  CAST(sum(freq) AS BIGINT) AS corpus_tokens,
             |  CAST(coalesce(sum(CASE WHEN sym = m.mtok THEN freq END), 0)
             |    AS BIGINT) AS merge_occ
             |  FROM s$r CROSS JOIN m$r m)""".stripMargin
        }.mkString(",\n")
        val unioned = (1 to 8).map(r => s"SELECT * FROM st$r")
          .mkString(" UNION ALL ")
        s"""WITH $bpeChainSqlCtes,
           |st0 AS (SELECT CAST(0 AS INT) AS round, '' AS merge_tok,
           |  CAST(sum(freq) AS BIGINT) AS corpus_tokens,
           |  CAST(0 AS BIGINT) AS merge_occ FROM s0),
           |$stats
           |SELECT round, merge_tok, corpus_tokens, merge_occ
           |FROM (SELECT * FROM st0 UNION ALL $unioned)
           |ORDER BY round""".stripMargin
      }),

    // X96 tokenizer-fertility audit (the per-language fairness read of
    // the X91 tokenizer: Ács 2019 "fertility" — tokens per word — and
    // chars-per-token compression, per language): apply the SAME
    // data-derived 8-merge BPE table q201 applies, then roll the
    // per-word post-merge token counts up BY LANGUAGE weighted by each
    // language's own word frequencies. A tokenizer mined on the pooled
    // corpus compresses the dominant language best; this is the audit
    // that quantifies the gap before the budget math (X12/X49/X66)
    // treats "token" as a language-neutral unit. All-integer ratios
    // (milli fixed point), exact at any scale.
    // Scale shape: q201's contraction carries over — the merge chain
    // runs on the DISTINCT word table (Heaps'-law sublinear); the only
    // corpus-proportional stages are the two word-frequency aggs
    // ((lang, word) and its word rollup, both map-side combinable);
    // the final rollup joins the vocab-sized nt table back to the
    // (lang, word) freq table — vocab-sized work, languages-sized output.
    Q("q210_bpe_fertility",
      (s, d) => {
        val wl = fanOut(documents(s, d))
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) >= 1)
          .groupBy("lang", "word").agg(count(lit(1)).as("freq"))
          .localCheckpoint(true) // read twice: word rollup + lang rollup
        val words = wl.groupBy("word").agg(sum("freq").as("freq"))
          .localCheckpoint(true) // read by the miner AND round 0
        val merges = bpeMineMerges(words, 8).localCheckpoint(true)
        var syms = words
          .select(col("word"), col("freq"),
            posexplode(expr(
              "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
          .toDF("word", "freq", "pos", "sym")
        // UNLIKE q201 (whose per-round stats re-read each round's table,
        // so it must checkpoint every round), this chain is LINEAR — each
        // round is read exactly once by the next — so the 8 rounds fuse
        // into ONE job of chained word-partitioned windows on a single
        // exchange (8 eager materializations gone; guide §1.2 "remove
        // passes", §2.4 shared partitioning). One checkpoint after the
        // last round keeps the declared rollup plan window-free (the
        // PlanSpec gate) and cuts the 16-window lineage before the join.
        for (r <- 1 to 8)
          syms = bpeRound(syms, bpeMergeRow(merges, r))
        syms = syms.localCheckpoint(true)
        val nt = syms.groupBy("word").agg(count(lit(1)).as("nt"))
        wl.join(nt, "word")
          .groupBy("lang")
          .agg(sum("freq").as("n_words"),
            sum(col("freq") * length(col("word"))).as("n_chars"),
            sum(col("freq") * col("nt")).as("n_tokens"))
          .select(col("lang"), col("n_words"), col("n_chars"),
            col("n_tokens"),
            // exactness window (q207/q199 pattern): the milli products
            // are bounded by 1000·n_chars / 1000·n_tokens — Spark wraps
            // silently past 2^63 where DuckDB widens to HUGEINT, so the
            // guard turns the divergence into a loud failure at
            // ~9.2e15 chars (~petabyte-scale text per language; chunk
            // per shard family or widen to DECIMAL(38,0) beyond that)
            (expr("(1000 * n_chars) DIV n_tokens") +
              coalesce(assert_true(
                col("n_chars") < lit(9223372036854775L) &&
                  col("n_tokens") < lit(9223372036854775L),
                lit("q210: per-language char/token total >= 2^63/1e3 — " +
                  "milli scaling would overflow long; chunk per shard " +
                  "or widen to DECIMAL(38,0)")).cast("long"), lit(0L)))
              .as("chars_per_token_milli"),
            expr("(1000 * n_tokens) DIV n_words")
              .as("tokens_per_word_milli"))
          .orderBy("lang")
      },
      Some(s"""WITH $bpeChainSqlCtes,
             |wl AS MATERIALIZED (
             |  SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
             |  FROM (SELECT lang, unnest(str_split(text, ' ')) AS word
             |        FROM documents)
             |  WHERE length(word) >= 1 GROUP BY 1, 2),
             |nt AS (SELECT word, CAST(count(*) AS BIGINT) AS nt
             |       FROM s8 GROUP BY word)
             |SELECT lang,
             |  CAST(sum(wl.freq) AS BIGINT) AS n_words,
             |  CAST(sum(wl.freq * length(wl.word)) AS BIGINT) AS n_chars,
             |  CAST(sum(wl.freq * nt.nt) AS BIGINT) AS n_tokens,
             |  CAST((1000 * sum(wl.freq * length(wl.word)))
             |    // sum(wl.freq * nt.nt) AS BIGINT)
             |    AS chars_per_token_milli,
             |  CAST((1000 * sum(wl.freq * nt.nt)) // sum(wl.freq)
             |    AS BIGINT) AS tokens_per_word_milli
             |FROM wl JOIN nt USING (word)
             |GROUP BY lang ORDER BY lang""".stripMargin)),
  )

  /** q124's first-iteration merge-pair statistic, restricted to
    * distinct-char pairs and ranked — the fixed merge table q201 applies.
    * `(pair string, rk int)`, rk in 1..k by (weighted count DESC, pair
    * ASC). The rank window runs AFTER a TakeOrdered limit, so it touches
    * exactly k rows — never the alphabet²-sized pair table.
    */
  /** Shared DuckDB CTE chain of the X91 BPE apply — `words` (corpus word
    * frequencies), `merges` (top-8 distinct-char pairs), `s0` (char
    * symbols) and the 8 unrolled merge rounds m$r/x$r/s$r. Each round's
    * s$r is read at least twice by consumers (the next round + a stats or
    * rollup read), so every s$r is AS MATERIALIZED — the q196 precedent;
    * x$r / m$r are single-use-ish and tiny, left plain. Shared by q201
    * (per-round compression stats) and q210 (per-language fertility
    * rollup) so the two oracles cannot drift.
    */
  private[graft] lazy val bpeChainSqlCtes: String = {
    val rounds = (1 to 8).map { r =>
      s"""m$r AS (SELECT coalesce(max(substr(pair, 1, 1)), chr(1)) AS ml,
         |  coalesce(max(substr(pair, 2, 1)), chr(2)) AS mr,
         |  coalesce(max(pair), '') AS mtok FROM merges WHERE rk = $r),
         |x$r AS (SELECT word, freq, pos, sym,
         |  lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt,
         |  lag(sym) OVER (PARTITION BY word ORDER BY pos) AS prv
         |  FROM s${r - 1}),
         |s$r AS MATERIALIZED (
         |  SELECT word, freq, CAST(row_number() OVER (
         |    PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
         |    CASE WHEN sym = m.ml AND nxt = m.mr
         |      THEN m.ml || m.mr ELSE sym END AS sym
         |  FROM x$r CROSS JOIN m$r m
         |  WHERE NOT (coalesce(prv, '') = m.ml AND sym = m.mr))"""
        .stripMargin
    }.mkString(",\n")
    s"""words AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(str_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE length(word) >= 1 GROUP BY 1),
       |merges AS MATERIALIZED (
       |  SELECT pair, rk FROM (
       |    SELECT pair, CAST(row_number() OVER (
       |      ORDER BY mc DESC, pair ASC) AS INT) AS rk
       |    FROM (
       |      SELECT pair, sum(freq) AS mc
       |      FROM (SELECT freq, unnest(list_transform(
       |              range(1, length(word)),
       |              i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
       |            FROM words WHERE length(word) >= 2)
       |      WHERE substr(pair, 1, 1) <> substr(pair, 2, 1)
       |      GROUP BY 1))
       |  WHERE rk <= 8),
       |s0 AS MATERIALIZED (
       |  SELECT word, freq, CAST(i AS BIGINT) AS pos,
       |    substr(word, CAST(i AS INTEGER), 1) AS sym
       |  FROM words, unnest(range(1, length(word) + 1)) AS u(i)),
       |$rounds""".stripMargin
  }

  private[graft] def bpeMineMerges(words: DataFrame, k: Int): DataFrame = {
    val topPairs = words
      .filter(length(col("word")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), " +
          "i -> substring(word, i, 2))")).as("pair"))
      .filter(substring(col("pair"), 1, 1) =!= substring(col("pair"), 2, 1))
      .groupBy("pair").agg(sum("freq").as("mc"))
      .orderBy(col("mc").desc, col("pair").asc)
      .limit(k)
    topPairs.select(col("pair"), row_number().over(
      Window.orderBy(col("mc").desc, col("pair").asc)).as("rk"))
  }

  /** Rank-r merge as a guaranteed 1-row frame `(ml, mr, mtok)` — aggregate
    * form so an absent rank degrades to never-matching sentinels instead
    * of an empty frame (which would annihilate a crossJoin).
    */
  private[graft] def bpeMergeRow(merges: DataFrame, r: Int): DataFrame =
    merges.filter(col("rk") === r)
      .groupBy().agg(
        coalesce(max(substring(col("pair"), 1, 1)), lit("\u0001")).as("ml"),
        coalesce(max(substring(col("pair"), 2, 1)), lit("\u0002")).as("mr"),
        coalesce(max(col("pair")), lit("")).as("mtok"))

  /** One BPE merge application over a symbol table `(word, freq, pos,
    * sym)`: every adjacent (ml, mr) symbol pair becomes one ml||mr symbol.
    * Exact greedy left-to-right BPE for distinct-char merges — matches
    * cannot overlap (see q201 scaladoc), so consumed-row removal plus a
    * conditional rewrite is the whole step. Positions are re-densified so
    * rounds compose.
    */
  private[graft] def bpeRound(syms: DataFrame, mergeRow: DataFrame): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    syms.crossJoin(broadcast(mergeRow))
      .withColumn("nxt", lead("sym", 1).over(w))
      .withColumn("prv", lag("sym", 1).over(w))
      .filter(!(coalesce(col("prv"), lit("")) === col("ml") &&
        col("sym") === col("mr")))
      .select(col("word"), col("freq"),
        row_number().over(w).as("pos"),
        when(col("sym") === col("ml") && col("nxt") === col("mr"),
          concat(col("ml"), col("mr"))).otherwise(col("sym")).as("sym"))
  }
}
