package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus-curation operators rounding out the published web-pipeline
  * recipes (SURVEY.md §2.12 extension surface): Gopher-style rule
  * filtering, domain/source reputation scoring, temperature-based
  * multilingual mixing, and tokenizer-fertility monitoring.
  *
  * These fill the four taxonomy slots the existing curation suite
  * (text_stats / quality_score / mix_sources / token_budget_mix) does
  * not cover: hard RULE thresholds (vs continuous scores), aggregation
  * at the DOMAIN grain (vs per-document), p^α temperature reweighting
  * (vs equal-count or token-budget mixing), and tokens-per-word
  * efficiency of a trained tokenizer (vs raw token counts).
  *
  * Scale notes (100 TB): every query is scan-local per-document math
  * followed by a low-cardinality aggregation (domains, languages) and
  * 1-row broadcast scalars — the document text never crosses the wire.
  * Cross-engine determinism follows the repo-wide discipline: exact
  * integer folds for sums, one shared expression text for any float
  * math, floor(x + 0.5) for display rounding (never round()).
  */
object CurationOps extends QueryModule {

  /** The MassiveText/Gopher stopword rule-list (Rae et al. 2021 §A.1.1:
    * "the, be, to, of, and, that, have, with"), extended with the
    * fixture vocabulary's second stopword 'a' so the ≥2-distinct rule
    * discriminates on the synthetic corpus (which contains only
    * 'the'/'a' of the published list). The list is a model constant —
    * production swaps it wholesale, the plan is list-size-independent.
    */
  private val StopList = Seq("the", "be", "to", "of", "and", "that", "have", "with", "a")
  private val StopIn = StopList.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Gopher-style rule filter — the hard-threshold document screen
    * published web pipelines run before any model-based scoring
    * (MassiveText quality filtering, reused by RefinedWeb/FineWeb):
    * word-count bounds, mean-word-length band, minimum distinct
    * stopwords, minimum alphabetic-word fraction. Emits the metrics,
    * each rule verdict, and the conjunction — downstream composes
    * `filter(col("keep"))`, keeping the audit columns for ablations.
    *
    * Determinism: word counts and stopword counts are exact integers;
    * mean word length and alpha fraction are single-division doubles
    * displayed via the shared floor(x·10⁴ + 0.5)/10⁴ text, and the
    * rule comparisons read the DISPLAYED value so both engines
    * threshold the identical double.
    *
    * At 100 TB: pure per-row projection — no shuffle except the
    * presentation sort; all expressions are built-in Catalyst HOFs
    * inside whole-stage codegen.
    */
  /** The per-row rule frame (metrics + per-rule verdicts + conjunction)
    * over any documents-shaped frame — shared by the declared
    * `gopher_rules` query and the streaming ingest rule screen
    * ([[graft.streaming.DocIngest.startRuleScreen]]), so the stream
    * admits exactly the documents the batch query keeps.
    */
  private[graft] def gopherRuled(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("ws", expr("filter(split(text, ' '), x -> x <> '')"))
        .withColumn("n_words", size(col("ws")).cast("long"))
        .withColumn(
          "sum_len",
          expr("aggregate(ws, CAST(0 AS BIGINT), (a, x) -> a + length(x))"),
        )
        .withColumn(
          "mean_word_len",
          expr(
            "CAST(floor(CAST(sum_len AS DOUBLE) / n_words * 10000.0 + 0.5) / 10000.0 AS DOUBLE)",
          ),
        )
        .withColumn(
          "n_stop_distinct",
          expr(s"size(array_distinct(filter(ws, w -> w IN $StopIn)))").cast("long"),
        )
        .withColumn(
          "alpha_frac",
          expr(
            """CAST(floor(CAST(size(filter(ws, w -> w rlike '[a-z]')) AS DOUBLE)
              | / n_words * 10000.0 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin,
          ),
        )
        .withColumn("r_words", col("n_words").between(50L, 100000L))
        .withColumn("r_mean_len", col("mean_word_len").between(3.0, 10.0))
        .withColumn("r_stop", col("n_stop_distinct") >= 2L)
        .withColumn("r_alpha", col("alpha_frac") >= 0.8)
        .withColumn(
          "keep",
          col("r_words") && col("r_mean_len") && col("r_stop") && col("r_alpha"),
        )
        .select(
          "doc_id", "n_words", "mean_word_len", "n_stop_distinct", "alpha_frac",
          "r_words", "r_mean_len", "r_stop", "r_alpha", "keep",
        )

  /** Shared DuckDB CTE chain for the rule screen, ending in
    * `gv(doc_id, n_words, mean_word_len, n_stop_distinct, alpha_frac,
    * r_words, r_mean_len, r_stop, r_alpha, keep)` — reused by the
    * `gopher_rules` oracle and `rule_model_crosstab` so the rule text
    * cannot drift between the screen and its audits.
    */
  private[graft] lazy val gopherDuckCtes: String =
    s"""gt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |       FROM documents),
       |gp AS (SELECT doc_id,
       |              CAST(len(ws) AS BIGINT) AS n_words,
       |              list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                list_transform(ws, x -> CAST(length(x) AS BIGINT))),
       |                (a, c) -> a + c) AS sum_len,
       |              CAST(len(list_distinct(list_filter(ws, w -> w IN $StopIn))) AS BIGINT)
       |                AS n_stop_distinct,
       |              CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS BIGINT)
       |                AS n_alpha
       |       FROM gt),
       |gm AS (SELECT doc_id, n_words,
       |              CAST(floor(CAST(sum_len AS DOUBLE) / n_words * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
       |                AS mean_word_len,
       |              n_stop_distinct,
       |              CAST(floor(CAST(n_alpha AS DOUBLE) / n_words * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
       |                AS alpha_frac
       |       FROM gp),
       |gv AS (SELECT doc_id, n_words, mean_word_len, n_stop_distinct, alpha_frac,
       |              (n_words BETWEEN 50 AND 100000) AS r_words,
       |              (mean_word_len BETWEEN 3.0 AND 10.0) AS r_mean_len,
       |              (n_stop_distinct >= 2) AS r_stop,
       |              (alpha_frac >= 0.8) AS r_alpha,
       |              ((n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
       |               AND (n_stop_distinct >= 2) AND (alpha_frac >= 0.8)) AS keep
       |       FROM gm)""".stripMargin

  /** The batch rule frame, substrate-cached per (session, dataset) —
    * `gopher_rules`, `rule_model_crosstab`, and `calibration_bins` all
    * consume it; the generic [[gopherRuled]] stays uncached for the
    * streaming screen.
    */
  private[graft] def gopherRuledCached(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    graft.SubstrateCache.substrate(s, d, "gopher-rules")(gopherRuled(documents(s, d)))

  private val gopherRules = DeclaredQuery(
    "gopher_rules",
    (s, d) => gopherRuledCached(s, d).orderBy("doc_id"),
    Some(s"""WITH $gopherDuckCtes
             SELECT doc_id, n_words, mean_word_len, n_stop_distinct, alpha_frac,
                    r_words, r_mean_len, r_stop, r_alpha, keep
             FROM gv ORDER BY doc_id"""),
  )

  /** Domain/source reputation — the RefinedWeb-style curation grain
    * ABOVE the document: per-source document counts and aggregate
    * quality, with below-corpus-mean sources flagged (the automated
    * stand-in for a domain blocklist review queue). The per-document
    * signal is the uniqueness ratio (distinct words / words), floored
    * to a ×10⁶ BIGINT per doc so the per-source sums are exact.
    *
    * The below-mean comparison never divides: `sum_uniq · g_docs <
    * g_uniq · n_docs` is the cross-multiplied exact-integer form of
    * `avg_src < avg_corpus` — no float for the engines to disagree on.
    *
    * At 100 TB: scan-local per-doc metrics → domain-keyed aggregation
    * (map-side combined; domains are ~10⁷, uniformly hashed — no skew
    * since the metric row is fixed-width regardless of doc count) →
    * one 1-row global broadcast. The text never shuffles; magnitudes
    * stay under 2⁶³ for corpora to ~10¹² docs (10⁶ scale × 10¹²·10¹²
    * would overflow, so a 10¹²-doc corpus drops the scale to 10³ —
    * documented knob, same plan).
    */
  /** Per-source additive reputation partials — (source, n_docs,
    * sum_chars, sum_uniq): every column is a count or an exact
    * ×10⁶-floored BIGINT sum, so slices merge by plain groupBy-sum.
    * Shared by the declared `source_reputation` (one-shot over the
    * corpus) and the continuous refresh
    * ([[graft.streaming.DocIngest.startSourcePartials]]) — the grain
    * the streaming store persists IS the batch derivation's first agg,
    * so the two paths cannot drift.
    */
  private[graft] def sourcePartials(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .withColumn("ws", expr("filter(split(text, ' '), x -> x <> '')"))
      .select(
        col("source"),
        length(col("text")).cast("long").as("nc"),
        expr(
          """CAST(floor(1000000.0 *
            | (CAST(size(array_distinct(ws)) AS DOUBLE) / size(ws))) AS BIGINT)""".stripMargin,
        ).as("u"),
      )
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nc").as("sum_chars"),
        sum("u").as("sum_uniq"),
      )

  /** The blocked-flag derivation over (merged) per-source partials —
    * the division-free cross-multiplied below-corpus-mean test. Kept
    * separate from [[sourcePartials]] so the serving path of the
    * continuous refresh states the identical comparison.
    */
  private[graft] def reputationFrom(perSrc: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val glob = perSrc.agg(
      sum("n_docs").as("g_docs"),
      sum("sum_uniq").as("g_uniq"),
    )
    perSrc
      .crossJoin(broadcast(glob)) // 1-row corpus totals
      .withColumn("blocked", col("sum_uniq") * col("g_docs") < col("g_uniq") * col("n_docs"))
      .select("source", "n_docs", "sum_chars", "sum_uniq", "blocked")
      .orderBy("source")
  }

  private val sourceReputation = DeclaredQuery(
    "source_reputation",
    (s, d) => reputationFrom(sourcePartials(documents(s, d))),
    Some("""WITH t AS (SELECT source, text,
                              list_filter(string_split(text, ' '), x -> x <> '') AS ws
                       FROM documents),
            p AS (SELECT source, CAST(length(text) AS BIGINT) AS nc,
                         CAST(floor(1000000.0 *
                           (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))) AS BIGINT) AS u
                  FROM t),
            s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(nc) AS BIGINT) AS sum_chars,
                         CAST(sum(u) AS BIGINT) AS sum_uniq
                  FROM p GROUP BY 1),
            g AS (SELECT CAST(sum(n_docs) AS BIGINT) AS g_docs,
                         CAST(sum(sum_uniq) AS BIGINT) AS g_uniq FROM s)
            SELECT source, n_docs, sum_chars, sum_uniq,
                   (sum_uniq * g_docs < g_uniq * n_docs) AS blocked
            FROM s CROSS JOIN g ORDER BY source"""),
  )

  /** Temperature-based multilingual sampling (the p^α recipe from
    * multilingual pretraining: α = 0.5 here) — per-language keep rates
    * ∝ p_l^α / p_l, normalized so the rarest language keeps rate 1,
    * realized as the repo's deterministic hash-bucket predicate (the
    * `mix_sources` discipline: same doc kept on every run, engine, and
    * partitioning). Distinct from `mix_sources` (α = 0: equal counts)
    * and `token_budget_mix` (absolute token targets): temperature
    * mixing SMOOTHS the distribution toward uniform without flattening
    * it.
    *
    * Float determinism: the rate formula is ONE shared expression text
    * — pow/division sequences are identical IEEE ops in both engines —
    * and the per-language threshold is floored to a ×10⁶ BIGINT before
    * any row comparison, so the kept set is integer-exact.
    *
    * At 100 TB: one language-count aggregation (map-side combined,
    * ~10² rows), a 5-row rate table broadcast back, and a stateless
    * scan predicate — the corpus crosses the wire zero times.
    */
  private val temperatureMix = DeclaredQuery(
    "temperature_mix",
    (s, d) => {
      val cnts = documents(s, d).groupBy("lang").agg(count(lit(1)).as("c"))
      val tot = cnts.agg(sum("c").as("ct"))
      val rates = cnts
        .crossJoin(broadcast(tot)) // 1-row corpus total
        .withColumn("wl", expr("pow(CAST(c AS DOUBLE) / ct, 0.5) / c"))
      val rmax = rates.agg(max("wl").as("rmax"))
      val thr = rates
        .crossJoin(broadcast(rmax)) // 1-row normalizer
        .withColumn("thr", expr("CAST(floor(wl / rmax * 1000000.0) AS BIGINT)"))
        .select("lang", "thr")
      documents(s, d)
        .join(broadcast(thr), Seq("lang")) // language-cardinality rate table
        .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(1000000L)))
        .filter(col("bucket") < col("thr"))
        .select("doc_id", "lang", "bucket", "thr")
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
            t AS (SELECT CAST(sum(c) AS BIGINT) AS ct FROM c),
            r AS (SELECT lang, pow(CAST(c AS DOUBLE) / ct, 0.5) / c AS wl FROM c CROSS JOIN t),
            m AS (SELECT max(wl) AS rmax FROM r),
            thr AS (SELECT lang, CAST(floor(wl / rmax * 1000000.0) AS BIGINT) AS thr
                    FROM r CROSS JOIN m)
            SELECT doc_id, lang, (doc_id * 2654435761) % 1000000 AS bucket, thr
            FROM documents JOIN thr USING (lang)
            WHERE (doc_id * 2654435761) % 1000000 < thr
            ORDER BY doc_id"""),
  )

  /** Tokenizer fertility — tokens per word and bytes per token, per
    * language, under the shipped BPE merge list: the standard monitor
    * for how well a trained tokenizer compresses each language slice
    * (high fertility = the vocabulary underserves that language, the
    * signal that drives vocab-size and merge-budget decisions).
    *
    * Plan shape is the `sequence_pack_bpe` discipline: the merge fold
    * runs once per DISTINCT word (vocabulary-cardinality, via
    * [[BpeOps.bpeWordTokenCounts]]), and the corpus side is
    * pre-aggregated to (lang, word, count) BEFORE the join — so the
    * join touches vocab × languages rows, never the token stream.
    * Totals are exact BIGINT sums; the two ratios are single divisions
    * displayed via the shared floor(x·10⁴ + 0.5)/10⁴ text.
    *
    * At 100 TB: the token stream reduces map-side to the (lang, word)
    * grid; everything after is vocabulary-scale. The un-hinted join
    * lets AQE broadcast the side that is actually small.
    */
  private val tokenFertility = DeclaredQuery(
    "token_fertility",
    (s, d) => {
      val wt = BpeOps.bpeWordTokenCounts(s, d)
      val dwc = documents(s, d)
        .select(col("lang"), explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
        .groupBy("lang", "w")
        .agg(count(lit(1)).as("wc"))
      dwc
        .join(wt, Seq("w")) // vocab-cardinality: un-hinted, AQE decides
        .groupBy("lang")
        .agg(
          sum(col("wc")).as("n_words"),
          sum(col("wc") * col("wtok")).as("n_tokens"),
          sum(col("wc") * length(col("w")).cast("long")).as("n_chars"),
        )
        .withColumn(
          "fertility",
          expr(
            "CAST(floor(CAST(n_tokens AS DOUBLE) / n_words * 10000.0 + 0.5) / 10000.0 AS DOUBLE)",
          ),
        )
        .withColumn(
          "bytes_per_token",
          expr(
            "CAST(floor(CAST(n_chars AS DOUBLE) / n_tokens * 10000.0 + 0.5) / 10000.0 AS DOUBLE)",
          ),
        )
        .orderBy("lang")
    }, {
      val sep = "chr(1)"
      Some(s"""WITH w0 AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
           dwc AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS wc
                   FROM w0 WHERE w <> '' GROUP BY 1, 2),
           v AS (SELECT DISTINCT w FROM w0 WHERE w <> ''),
           m0 AS (SELECT w,
                         $sep || array_to_string(
                           list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)),
                           $sep) AS enc
                  FROM v),
           ${BpeOps.encodeStepsDuck("w")},
           wt AS (SELECT w,
                         CAST(len(list_filter(string_split(enc, $sep), s -> s <> '')) AS BIGINT) AS wtok
                  FROM ${BpeOps.lastEncodeStep}),
           a AS (SELECT lang,
                        CAST(sum(wc) AS BIGINT) AS n_words,
                        CAST(sum(wc * wtok) AS BIGINT) AS n_tokens,
                        CAST(sum(wc * length(w)) AS BIGINT) AS n_chars
                 FROM dwc JOIN wt USING (w) GROUP BY 1)
           SELECT lang, n_words, n_tokens, n_chars,
                  CAST(floor(CAST(n_tokens AS DOUBLE) / n_words * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
                    AS fertility,
                  CAST(floor(CAST(n_chars AS DOUBLE) / n_tokens * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
                    AS bytes_per_token
           FROM a ORDER BY lang""")
    },
  )

  /** Per-source Kolmogorov–Smirnov drift statistic over document length —
    * the distribution-shift monitor for a NUMERIC per-doc signal (the
    * `vocab_js_divergence` twin for the other signal class: JS watches
    * the categorical vocabulary, KS watches a continuous marginal like
    * length, quality score, or perplexity; a crawl snapshot whose length
    * distribution walks away from the corpus shows up here first).
    * D = sup|ECDF_src − ECDF_corpus|, evaluated at every observed length
    * (the sup of a difference of step functions is attained at a jump
    * point, so the observed-value grid is exact, not an approximation).
    *
    * Exact across engines: both ECDFs stay cross-multiplied integers —
    * D's argmax compares |s_cum·g_n − g_cum·s_n| (BIGINT) — with ONE
    * double division at the end (ks_ppm, the shared floor text). Plan:
    * one (source, len) count agg, a sources × lengths grid join (both
    * bounded: the grid is statistics-sized, never corpus-sized), two
    * cumulative windows partitioned by source / none (the global one
    * runs over ≤ distinct-lengths rows). At 100 TB the value grid is
    * first bucketed to a fixed histogram (1024 bins) so the grid stays
    * constant-size; the fixture's 313 raw lengths stand in for the
    * binned values — same plan either way, and the text never shuffles
    * (counts only).
    */
  private val ksDrift = DeclaredQuery(
    "ks_drift",
    (s, d) => {
      val docs = documents(s, d).select(col("source"), col("n_chars"))
      val perSV = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
      val vals = docs.select("n_chars").distinct()
      val srcs = docs.groupBy("source").agg(count(lit(1)).as("s_n"))
      val grid = srcs
        .crossJoin(vals)
        .join(perSV, Seq("source", "n_chars"), "left")
        .na
        .fill(0L, Seq("cnt"))
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy("n_chars")
      val gcum = docs
        .groupBy("n_chars")
        .agg(count(lit(1)).as("gcnt"))
        .withColumn(
          "g_cum",
          sum("gcnt").over(
            org.apache.spark.sql.expressions.Window
              .orderBy("n_chars")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)),
        )
        .select("n_chars", "g_cum")
      val gn = docs.agg(count(lit(1)).as("g_n"))
      grid
        .withColumn("s_cum", sum("cnt").over(wSrc.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .join(gcum, Seq("n_chars"))
        .crossJoin(broadcast(gn)) // 1×1 scalar
        .groupBy("source", "s_n", "g_n")
        .agg(max(abs(col("s_cum") * col("g_n") - col("g_cum") * col("s_n"))).as("d_num"))
        .withColumn(
          "ks_ppm",
          expr("CAST(floor(CAST(d_num AS DOUBLE) * 1000000.0 / (s_n * g_n) + 0.5) AS BIGINT)"),
        )
        .select("source", "s_n", "d_num", "ks_ppm")
        .orderBy("source")
    },
    Some("""WITH docs AS (SELECT source, n_chars FROM documents),
            sv AS (SELECT source, n_chars, count(*) AS cnt FROM docs GROUP BY 1, 2),
            vals AS (SELECT DISTINCT n_chars FROM docs),
            srcs AS (SELECT source, count(*) AS s_n FROM docs GROUP BY 1),
            grid AS (SELECT srcs.source, srcs.s_n, vals.n_chars,
                            coalesce(sv.cnt, 0) AS cnt
                     FROM srcs CROSS JOIN vals
                     LEFT JOIN sv ON sv.source = srcs.source AND sv.n_chars = vals.n_chars),
            sc AS (SELECT source, s_n, n_chars,
                          sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
                                         ROWS UNBOUNDED PRECEDING) AS s_cum
                   FROM grid),
            gc AS (SELECT n_chars,
                          sum(cnt2) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS g_cum
                   FROM (SELECT n_chars, count(*) AS cnt2 FROM docs GROUP BY 1)),
            gn AS (SELECT count(*) AS g_n FROM docs),
            dmax AS (SELECT source, s_n, g_n,
                            CAST(max(abs(s_cum * g_n - g_cum * s_n)) AS BIGINT) AS d_num
                     FROM sc JOIN gc USING (n_chars), gn
                     GROUP BY 1, 2, 3)
            SELECT source, CAST(s_n AS BIGINT) AS s_n, d_num,
                   CAST(floor(CAST(d_num AS DOUBLE) * 1000000.0 / (s_n * g_n) + 0.5) AS BIGINT)
                     AS ks_ppm
            FROM dmax ORDER BY source"""),
  )

  /** Quality threshold for the crosstab's model arm: near the fixture
    * corpus median (66.6), so all four cells populate. A production run
    * sets this to the model's calibrated operating point; the audit
    * shape is threshold-independent.
    */
  private val CrosstabQTau = 65.0

  /** Rule-vs-model agreement crosstab — the curation-ablation audit
    * (FineWeb-style pipeline reports): every document classified by BOTH
    * the Gopher hard-rule screen and the model-based quality score,
    * counted into the 2×2 (rule keep × model above-threshold) matrix.
    * The off-diagonal cells are the review queues: rule-keep but
    * model-low (candidate false negatives of the model) and rule-drop
    * but model-high (rules too blunt — the cell that motivated
    * RefinedWeb to relax MassiveText's thresholds). Both arms are the
    * SHARED helpers behind their declared queries ([[gopherRuled]],
    * TextOps.qualityScored + the shared oracle CTE chains), so the audit
    * cannot drift from the screens it audits. Plan: two scan-local
    * per-doc projections, one doc-keyed join (same-source frames — AQE
    * picks the strategy), a 4-row aggregate; the text never shuffles.
    */
  private val ruleModelCrosstab = DeclaredQuery(
    "rule_model_crosstab",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val g = gopherRuledCached(s, d).select(col("doc_id"), col("keep").as("r_keep"))
      val q = TextOps
        .qualityScoredCached(s, d)
        .select(col("doc_id"), (col("quality") >= CrosstabQTau).as("m_above"))
      g.join(q, Seq("doc_id")) // un-hinted: both sides corpus-cardinality
        .groupBy("r_keep", "m_above")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("r_keep", "m_above")
    },
    Some(s"""WITH $gopherDuckCtes,
             ${TextOps.qualityDuckCtes}
             SELECT gv.keep AS r_keep,
                    (round(CAST(score_sum AS DOUBLE) / greatest(n_feats, 1), 4) >= $CrosstabQTau)
                      AS m_above,
                    count(*) AS n_docs
             FROM gv JOIN qs USING (doc_id)
             GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  /** Model calibration curve — the reliability diagram behind
    * `rule_model_crosstab`'s single operating point: quality scores
    * bucketed into 10 equal-width bins over the observed range, each bin
    * reporting how often the Gopher rule screen agrees (keep rate). A
    * well-calibrated quality model shows keep_ppm rising monotonically
    * with the bin — the curve that picks the threshold `CrosstabQTau`
    * stands in for, and the audit FineWeb-style ablations publish.
    *
    * Determinism: the binning is ALL-INTEGER — quality (already rounded
    * 4 dp by the shared scorer) is ×10⁴-rescaled via the shared
    * floor(+0.5) text, min/max ride a 1-row broadcast cross join, and
    * the bin index is integer multiply/divide (non-negative numerator,
    * so truncation agrees across engines). Plan: two scan-local doc
    * projections, one un-hinted doc-keyed join (AQE), a 1-row scalar
    * join, a ≤10-row agg — the text shuffles zero times.
    */
  private val calibrationBins = DeclaredQuery(
    "calibration_bins",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val g = gopherRuledCached(s, d).select(col("doc_id"), col("keep"))
      val q = TextOps
        .qualityScoredCached(s, d)
        .select(col("doc_id"), expr("CAST(floor(quality * 10000.0 + 0.5) AS BIGINT)").as("q4"))
      val mm = q.agg(min("q4").as("qmin"), max("q4").as("qmax"))
      q.join(g, Seq("doc_id")) // un-hinted: both sides corpus-cardinality
        .crossJoin(broadcast(mm)) // 1-row scalar
        .withColumn("bin", expr("least(CAST(9 AS BIGINT), ((q4 - qmin) * 10) DIV (qmax - qmin + 1))"))
        .groupBy("bin")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        )
        .withColumn(
          "keep_ppm",
          expr("CAST(floor(CAST(n_keep AS DOUBLE) * 1000000.0 / n_docs + 0.5) AS BIGINT)"),
        )
        .orderBy("bin")
    },
    Some(s"""WITH $gopherDuckCtes,
             ${TextOps.qualityDuckCtes},
             qq AS (SELECT doc_id,
                           CAST(floor(round(CAST(score_sum AS DOUBLE) / greatest(n_feats, 1), 4)
                                      * 10000.0 + 0.5) AS BIGINT) AS q4
                    FROM qs),
             mm AS (SELECT min(q4) AS qmin, max(q4) AS qmax FROM qq),
             b AS (SELECT qq.doc_id, gv.keep,
                          least(9, ((q4 - qmin) * 10) // (qmax - qmin + 1)) AS bin
                   FROM qq JOIN gv ON qq.doc_id = gv.doc_id, mm)
             SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
                    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
                    CAST(floor(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                               * 1000000.0 / count(*) + 0.5) AS BIGINT) AS keep_ppm
             FROM b GROUP BY bin ORDER BY bin"""),
  )

  /** Per-source quantile normalization of the quality score — the
    * cross-source calibration step mixing pipelines need because a
    * linear scorer's raw scale drifts per domain (newswire scores high,
    * forums low, regardless of in-domain quality): replace the raw score
    * with its percentile WITHIN the source, so "top 20% of each source"
    * means the same thing everywhere (CCNet's per-shard head/middle/tail
    * is this exact move). pct_ppm = (rank−1)·10⁶/(n−1), all-integer.
    *
    * Plan: one un-hinted doc-keyed join (score frame is the cached
    * substrate), then ONE source-keyed exchange serving both the rank
    * window and the count window. Per-source ranking at 10⁹ docs/source
    * would single-task the window — the documented move is the
    * `sequence_pack` two-phase prefix-rank (range-partition within
    * source, offset merge); at the declared grain (source-sized
    * partitions) the plain window is the right plan.
    */
  private val scoreQuantileNorm = DeclaredQuery(
    "score_quantile_norm",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val q = TextOps
        .qualityScoredCached(s, d)
        .select(col("doc_id"), expr("CAST(floor(quality * 10000.0 + 0.5) AS BIGINT)").as("q4"))
      val w = Window.partitionBy("source").orderBy(col("q4"), col("doc_id"))
      val wc = Window.partitionBy("source")
      documents(s, d)
        .select(col("doc_id"), col("source"))
        .join(q, Seq("doc_id")) // un-hinted: both sides corpus-cardinality
        .withColumn("rk", row_number().over(w))
        .withColumn("n_src", count(lit(1)).over(wc))
        .select(
          col("doc_id"),
          col("source"),
          col("q4"),
          expr(
            "CAST(floor(CAST(rk - 1 AS DOUBLE) * 1000000.0 / greatest(n_src - 1, 1) + 0.5) AS BIGINT)",
          ).as("pct_ppm"),
        )
        .orderBy("doc_id")
    },
    Some(s"""WITH ${TextOps.qualityDuckCtes},
             qy AS (SELECT doc_id,
                           CAST(floor(round(CAST(score_sum AS DOUBLE) / greatest(n_feats, 1), 4)
                                      * 10000.0 + 0.5) AS BIGINT) AS q4
                    FROM qs),
             j AS (SELECT d.doc_id, d.source, q4 FROM documents d JOIN qy ON d.doc_id = qy.doc_id),
             rkd AS (SELECT doc_id, source, q4,
                            row_number() OVER (PARTITION BY source ORDER BY q4, doc_id) AS rk,
                            count(*) OVER (PARTITION BY source) AS n_src
                     FROM j)
             SELECT doc_id, source, q4,
                    CAST(floor(CAST(rk - 1 AS DOUBLE) * 1000000.0 / greatest(n_src - 1, 1) + 0.5) AS BIGINT)
                      AS pct_ppm
             FROM rkd ORDER BY doc_id"""),
  )

  /** Top-p (nucleus) concentration audit — "how many heads cover 90% of
    * the mass": per event_type, the smallest number of users whose
    * summed value reaches 90% of the type's total, beside the
    * participant count. The training-mix twin of nucleus sampling, and
    * the concentration number (a Lorenz-curve point) every dataset card
    * reports — a feed where 5 of 10⁶ contributors carry 90% of the mass
    * needs capping (`winsorize_values`) before it biases the mix.
    *
    * Determinism: per-user mass sums in DECIMAL(18,2) (exact), and the
    * 90% test is the integer-exact cross-multiplication `cum·10 ≥
    * total·9` — no double ever enters a comparison. Ties in user mass
    * break on user_id in both engines.
    *
    * Plan: (type, user) hash agg collapses the corpus to participant
    * grain — the only corpus-sized step; the cumulative window and the
    * covering-count agg run per type over participant-grain rows, the
    * same one-exchange bound as `score_quantile_norm`. At 100 TB the
    * heavy-head windows are exactly where AQE skew splitting applies.
    */
  private val nucleusCoverage = DeclaredQuery(
    "nucleus_coverage",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val perUser = events(s, d)
        .groupBy("event_type", "user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).as("mass"))
      val w = Window
        .partitionBy("event_type")
        .orderBy(col("mass").desc, col("user_id"))
      perUser
        .withColumn("cum", sum("mass").over(w))
        .withColumn("total", sum("mass").over(Window.partitionBy("event_type")))
        .withColumn("rk", row_number().over(w))
        .withColumn("covers", col("cum") * 10 >= col("total") * 9)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_users"),
          min(when(col("covers"), col("rk"))).cast("long").as("n_for_90pct"),
        )
        .orderBy("event_type")
    },
    Some("""WITH pu AS (SELECT event_type, user_id,
                               sum(CAST(value AS DECIMAL(18,2))) AS mass
                        FROM events GROUP BY 1, 2),
            c AS (SELECT event_type, user_id, mass,
                         sum(mass) OVER (PARTITION BY event_type
                                         ORDER BY mass DESC, user_id
                                         ROWS UNBOUNDED PRECEDING) AS cum,
                         sum(mass) OVER (PARTITION BY event_type) AS total,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY mass DESC, user_id) AS rk
                  FROM pu)
            SELECT event_type, count(*) AS n_users,
                   CAST(min(CASE WHEN cum * 10 >= total * 9 THEN rk END) AS BIGINT) AS n_for_90pct
            FROM c GROUP BY 1 ORDER BY 1"""),
  )

  /** k-anonymity audit (Sweeney 2002) — the privacy gate a data card
    * answers before an event corpus ships for training: rows whose
    * quasi-identifier tuple (event type, day, coarse value band) is
    * shared by fewer than k records are re-identification candidates.
    * One row per k ∈ {2, 5, 10}: small-class count, rows at risk, and
    * the exact-ppm risk share — the curve that decides how much
    * generalization (coarser bands) the release needs.
    *
    * Scale: the QI-class aggregation is the ONLY corpus-sized step (one
    * map-side-combined hash agg to class cardinality); the k grid is a
    * 3-row literal crossed against class rows (conditional sums — the
    * `jaccard_threshold_sweep` shape), so zero-risk thresholds still
    * emit. Day and band are integer arithmetic (epoch-µs floor
    * division; floor(value/50) on the same IEEE double both engines
    * read) — no calendar/locale functions, no float compares at the
    * group key.
    */
  /** The QI × acting-user grain both privacy audits reduce through —
    * (event_type, day, value band, user_id, c): the row count per cell
    * is ADDITIVE (slices merge by groupBy-sum) and the class-level
    * distinct-user count is a dedup over grain rows, so the grain is
    * exactly what the continuous privacy store persists
    * ([[graft.streaming.EventStream.startQiGrain]]) — the audits served
    * from state ride the SAME [[qiClasses]]/[[kAnonymityFrom]]/
    * [[lDiversityFrom]] pipeline as the declared queries and cannot
    * drift from them.
    */
  private[graft] def qiUserGrain(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    // FLOOR epoch-day (the typeDayCounts spelling, stated identically
    // in the oracle): truncating division misplaces pre-1970 ts
    ev.withColumn(
      "day_no",
      expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) DIV 86400000000"),
    )
      .withColumn("vb", expr("CAST(floor(value / 50.0) AS BIGINT)"))
      .groupBy("event_type", "day_no", "vb", "user_id")
      .agg(count(lit(1)).as("c"))

  /** The batch-query form of [[qiUserGrain]], substrate-pinned
    * (optimization round 17): three declared privacy audits
    * (`k_anonymity`, `l_diversity`, `t_closeness`) share the one
    * corpus-sized grain aggregation; the streaming store keeps applying
    * the per-batch form, unpinned.
    */
  private def qiGrainPinned(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.SubstrateCache.substrate(s, d, "qi-user-grain")(qiUserGrain(events(s, d)))

  /** QI classes from (merged) grain rows: size + distinct sensitive
    * values per class.
    */
  private[graft] def qiClasses(grain: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    grain
      .groupBy("event_type", "day_no", "vb")
      .agg(sum("c").as("csz"), countDistinct(col("user_id")).as("ldiv"))

  private[graft] def kAnonymityFrom(
      s: org.apache.spark.sql.SparkSession,
      classes: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq(2L, 5L, 10L)
      .toDF("k")
      .crossJoin(classes)
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("csz") < col("k"), 1L).otherwise(0L)).as("n_small"),
        sum(when(col("csz") < col("k"), col("csz")).otherwise(0L)).as("rows_at_risk"),
        sum(col("csz")).as("n_rows"),
      )
      .withColumn("risk_ppm", expr("rows_at_risk * 1000000 DIV n_rows"))
      .select("k", "n_classes", "n_small", "rows_at_risk", "risk_ppm")
      .orderBy("k")
  }

  private[graft] def lDiversityFrom(
      s: org.apache.spark.sql.SparkSession,
      classes: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq(2L, 3L, 5L)
      .toDF("l")
      .crossJoin(classes)
      .groupBy("l")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("ldiv") < col("l"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("ldiv") < col("l"), col("csz")).otherwise(0L)).as("rows_at_risk"),
        sum(col("csz")).as("n_rows"),
      )
      .withColumn("risk_ppm", expr("rows_at_risk * 1000000 DIV n_rows"))
      .select("l", "n_classes", "n_low", "rows_at_risk", "risk_ppm")
      .orderBy("l")
  }

  private val kAnonymity = DeclaredQuery(
    "k_anonymity",
    (s, d) => kAnonymityFrom(s, qiClasses(qiGrainPinned(s, d))),
    Some("""WITH c AS (SELECT event_type,
                              (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                              CAST(floor(value / 50.0) AS BIGINT) AS vb,
                              CAST(count(*) AS BIGINT) AS csz
                       FROM events GROUP BY 1, 2, 3),
            g AS (SELECT unnest([2, 5, 10]) AS k),
            a AS (SELECT g.k, count(*) AS n_classes,
                         CAST(sum(CASE WHEN c.csz < g.k THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
                         CAST(sum(CASE WHEN c.csz < g.k THEN c.csz ELSE 0 END) AS BIGINT)
                           AS rows_at_risk,
                         CAST(sum(c.csz) AS BIGINT) AS n_rows
                  FROM g CROSS JOIN c GROUP BY 1)
            SELECT CAST(k AS BIGINT) AS k, n_classes, n_small, rows_at_risk,
                   (rows_at_risk * 1000000) // n_rows AS risk_ppm
            FROM a ORDER BY k"""),
  )

  /** l-diversity audit — k-anonymity's stronger sibling (Machanavajjhala
    * 2006): a QI class can be large yet still leak if every row in it
    * shares the same SENSITIVE value (here the acting user), so the gate
    * counts DISTINCT sensitive values per class. One row per
    * l ∈ {2, 3, 5}: classes below l, rows in them, exact-ppm share —
    * read together with `k_anonymity`, the two curves decide the
    * generalization level a release needs.
    *
    * Scale: the class agg carries a distinct-count — per-class state is
    * bounded by the sensitive-value cardinality inside a class (the
    * quantity being audited; classes near the k/l thresholds are tiny
    * by definition, and huge-class distinct state is exactly when the
    * audit passes trivially — `distinct_sketch`'s bounded register is
    * the documented swap if class×user state ever binds). The l grid is
    * the 3-row literal conditional-sum shape.
    */
  private val lDiversity = DeclaredQuery(
    "l_diversity",
    (s, d) => lDiversityFrom(s, qiClasses(qiGrainPinned(s, d))),
    Some("""WITH c AS (SELECT event_type,
                              (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                              CAST(floor(value / 50.0) AS BIGINT) AS vb,
                              CAST(count(*) AS BIGINT) AS csz,
                              CAST(count(DISTINCT user_id) AS BIGINT) AS ldiv
                       FROM events GROUP BY 1, 2, 3),
            g AS (SELECT unnest([2, 3, 5]) AS l),
            a AS (SELECT g.l, count(*) AS n_classes,
                         CAST(sum(CASE WHEN c.ldiv < g.l THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
                         CAST(sum(CASE WHEN c.ldiv < g.l THEN c.csz ELSE 0 END) AS BIGINT)
                           AS rows_at_risk,
                         CAST(sum(c.csz) AS BIGINT) AS n_rows
                  FROM g CROSS JOIN c GROUP BY 1)
            SELECT CAST(l AS BIGINT) AS l, n_classes, n_low, rows_at_risk,
                   (rows_at_risk * 1000000) // n_rows AS risk_ppm
            FROM a ORDER BY l"""),
  )

  /** t-closeness audit — the third rung of the release-privacy ladder
    * (Li, Li & Venkatasubramanian 2007): a class can be large
    * (k-anonymous) and diverse (l-diverse) yet still leak if its
    * SENSITIVE-VALUE DISTRIBUTION differs sharply from the corpus-wide
    * one (e.g. a class where one user contributes 90% of rows when
    * globally they contribute 1%). Per QI class, the total-variation
    * distance between the class's user distribution and the global
    * user distribution, TV = ½ Σ_u |c_cu/n_c − c_u/N| ∈ [0, 1] — the
    * paper's variational-distance instantiation — then the threshold
    * grid t ∈ {200, 500, 800}‰: classes FARTHER than t, rows in them,
    * exact-ppm share. Read with the other two curves, the triad decides
    * the generalization level a release needs.
    *
    * Exactness: the in-class sum cross-multiplies to integers
    * (|c_cu·N − c_u·n_c|, denominator n_c·N) and the out-of-class mass
    * telescopes to (N − G_c)/N where G_c is the class's users' GLOBAL
    * row count — so TV needs NO full class × user-universe join, only
    * the class's own user rows. Products reach corpus² (~10²² at
    * 100 TB) — DECIMAL(38,0) accumulators, one truncating integral
    * division per class, BIGINT out (the round-16 dtype discipline).
    *
    * Scale: rides the SAME persisted QI × user grain as `k_anonymity` /
    * `l_diversity` (third serve of one store,
    * [[graft.streaming.EventStream.tClosenessFromState]]); the grain
    * agg is the only corpus-sized step, everything after is class- and
    * user-cardinality. The 3-row t grid is the literal
    * conditional-sum shape.
    */
  private[graft] def tClosenessFrom(
      s: org.apache.spark.sql.SparkSession,
      grain: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // `grain` is a MERGED (event_type, day_no, vb, user_id, c) grain —
    // one row per key (both callers guarantee it: the batch substrate is
    // the groupBy itself, the streaming store merges by groupBy-sum), so
    // the former re-grouping here was a redundant full exchange of the
    // grain (optimization round 17, guide §2.4) — a rename suffices.
    val cu = grain.withColumnRenamed("c", "ccu")
    val ug = grain.groupBy("user_id").agg(sum(col("c")).as("cug"))
    val tot = ug.agg(sum(col("cug")).as("nn"))
    val ctot = cu.groupBy("event_type", "day_no", "vb").agg(sum(col("ccu")).as("nc"))
    val classes = cu
      .join(ug, Seq("user_id"))
      .join(ctot, Seq("event_type", "day_no", "vb"))
      .crossJoin(broadcast(tot))
      .withColumn(
        "dev",
        expr("""abs(CAST(ccu AS DECIMAL(38,0)) * nn - CAST(cug AS DECIMAL(38,0)) * nc)""")
          .cast("decimal(38,0)"),
      )
      .groupBy("event_type", "day_no", "vb", "nc", "nn")
      .agg(
        sum(col("dev")).as("sdev"),
        sum(col("cug")).as("gc"),
      )
      .withColumn(
        "t_e3",
        expr("""(CAST(sdev AS DECIMAL(38,0))
               |   + (CAST(nn AS DECIMAL(38,0)) - gc) * nc) * 1000
               |  DIV (CAST(2 AS DECIMAL(38,0)) * nc * nn)""".stripMargin),
      )
    Seq(200L, 500L, 800L)
      .toDF("t")
      .crossJoin(classes)
      .groupBy("t")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("t_e3") > col("t"), 1L).otherwise(0L)).as("n_far"),
        sum(when(col("t_e3") > col("t"), col("nc")).otherwise(0L)).as("rows_at_risk"),
        sum(col("nc")).as("n_rows"),
      )
      .withColumn("risk_ppm", expr("rows_at_risk * 1000000 DIV n_rows"))
      .select("t", "n_classes", "n_far", "rows_at_risk", "risk_ppm")
      .orderBy("t")
  }

  private val tCloseness = DeclaredQuery(
    "t_closeness",
    (s, d) => tClosenessFrom(s, qiGrainPinned(s, d)),
    Some("""WITH cu AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(floor(value / 50.0) AS BIGINT) AS vb,
                               user_id,
                               CAST(count(*) AS BIGINT) AS ccu
                        FROM events GROUP BY 1, 2, 3, 4),
            ug AS (SELECT user_id, CAST(sum(ccu) AS BIGINT) AS cug FROM cu GROUP BY 1),
            tot AS (SELECT CAST(sum(cug) AS BIGINT) AS nn FROM ug),
            ctot AS (SELECT event_type, day_no, vb, CAST(sum(ccu) AS BIGINT) AS nc
                     FROM cu GROUP BY 1, 2, 3),
            cl AS (SELECT c.event_type, c.day_no, c.vb, x.nc, t.nn,
                          sum(abs(CAST(c.ccu AS HUGEINT) * t.nn
                                  - CAST(u.cug AS HUGEINT) * x.nc)) AS sdev,
                          CAST(sum(u.cug) AS BIGINT) AS gc
                   FROM cu c
                   JOIN ug u USING (user_id)
                   JOIN ctot x USING (event_type, day_no, vb)
                   CROSS JOIN tot t
                   GROUP BY 1, 2, 3, 4, 5),
            tv AS (SELECT *,
                          CAST((sdev + (CAST(nn AS HUGEINT) - gc) * nc) * 1000
                               // (CAST(2 AS HUGEINT) * nc * nn) AS BIGINT) AS t_e3
                   FROM cl),
            g AS (SELECT unnest([200, 500, 800]) AS t),
            a AS (SELECT g.t, count(*) AS n_classes,
                         CAST(sum(CASE WHEN tv.t_e3 > g.t THEN 1 ELSE 0 END) AS BIGINT) AS n_far,
                         CAST(sum(CASE WHEN tv.t_e3 > g.t THEN tv.nc ELSE 0 END) AS BIGINT)
                           AS rows_at_risk,
                         CAST(sum(tv.nc) AS BIGINT) AS n_rows
                  FROM g CROSS JOIN tv GROUP BY 1)
            SELECT CAST(t AS BIGINT) AS t, n_classes, n_far, rows_at_risk,
                   (rows_at_risk * 1000000) // n_rows AS risk_ppm
            FROM a ORDER BY t"""),
  )

  /** Population stability index per source vs the corpus (the
    * industry-standard drift metric beside `ks_drift`'s sup-distance:
    * PSI weights WHERE the mass moved, KS only how far the CDFs
    * separate — monitoring stacks read both). Distribution = document
    * length over fixed [[PsiBinChars]]-char bins; add-1 smoothing over
    * the corpus's OWN bin grid keeps every log finite without an
    * arbitrary ε (counts are exact, so the smoothed ratios are exact
    * rationals).
    *
    * Cross-engine exactness: each bin's (ps − pg)·ln(ps/pg) is ONE
    * shared double chain from exact integer counts — same parse, same
    * IEEE order, ln bit-identical — ×10⁹-floored at the BIN so the
    * per-source sum is exact order-invariant BIGINT (the chi2 cell
    * discipline).
    *
    * Scale: one (source, bin) groupBy off the doc scan (map-side
    * combined, sources × ~10 bins rows), a bin-grain rollup for the
    * corpus arm, a broadcast grid join. Nothing corpus-sized after the
    * first agg.
    */
  private val PsiBinChars = 64L

  /** The mergeable PSI grain: per-slice (source, 64-char bin, count).
    * Counts are additive, so per-batch grains merge by plain sum — the
    * streaming twin ([[graft.streaming.DocIngest.startPsiPartials]])
    * lands exactly this frame per micro-batch.
    */
  private[graft] def psiBinCounts(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("source"), expr(s"n_chars DIV $PsiBinChars").as("bin"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("c"))

  /** The PSI report from a merged (source, bin, c) grain — the SHARED
    * post-grain pipeline of the declared batch query and the streaming
    * serve. The smoothing denominators (bin-grid size, corpus size) are
    * derived from the MERGED grain, which is why per-batch PSI would be
    * wrong: the null distribution only exists after the merge.
    */
  private[graft] def psiFrom(sb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val gb = sb.groupBy("bin").agg(sum("c").as("gc"))
      val srcs = sb.groupBy("source").agg(sum("c").as("s_n"))
      val nb = gb.agg(count(lit(1)).as("n_bins"), sum("gc").as("g_n"))
      val term =
        s"""CAST(floor(((CAST(c + 1 AS DOUBLE) / (s_n + n_bins)) - (CAST(gc + 1 AS DOUBLE) / (g_n + n_bins)))
           | * ln((CAST(c + 1 AS DOUBLE) / (s_n + n_bins)) / (CAST(gc + 1 AS DOUBLE) / (g_n + n_bins)))
           | * 1000000000.0 + 0.5) AS BIGINT)""".stripMargin.replace("\n", "")
      srcs
        .crossJoin(broadcast(gb))
        .join(sb, Seq("source", "bin"), "left")
        .na
        .fill(0L, Seq("c"))
        .crossJoin(broadcast(nb))
        .withColumn("t", expr(term))
        .groupBy("source", "s_n")
        .agg(count(lit(1)).as("n_bins"), sum("t").as("psi_e9"))
        .select(col("source"), col("s_n"), col("n_bins"), col("psi_e9"))
        .orderBy("source")
  }

  private val psiDrift = DeclaredQuery(
    "psi_drift",
    (s, d) => psiFrom(psiBinCounts(documents(s, d))),
    Some(s"""WITH docs AS (SELECT source, n_chars // $PsiBinChars AS bin FROM documents),
             sb AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c FROM docs GROUP BY 1, 2),
             gb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS gc FROM sb GROUP BY 1),
             srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS s_n FROM sb GROUP BY 1),
             nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bins, CAST(sum(gc) AS BIGINT) AS g_n FROM gb),
             grid AS (SELECT srcs.source, srcs.s_n, gb.bin, gb.gc, coalesce(sb.c, 0) AS c
                      FROM srcs CROSS JOIN gb
                      LEFT JOIN sb ON sb.source = srcs.source AND sb.bin = gb.bin),
             terms AS (SELECT source, s_n,
                              CAST(floor(((CAST(c + 1 AS DOUBLE) / (s_n + n_bins)) - (CAST(gc + 1 AS DOUBLE) / (g_n + n_bins))) * ln((CAST(c + 1 AS DOUBLE) / (s_n + n_bins)) / (CAST(gc + 1 AS DOUBLE) / (g_n + n_bins))) * 1000000000.0 + 0.5) AS BIGINT) AS t
                       FROM grid CROSS JOIN nb)
             SELECT source, s_n, CAST(count(*) AS BIGINT) AS n_bins,
                    CAST(sum(t) AS BIGINT) AS psi_e9
             FROM terms GROUP BY 1, 2 ORDER BY source"""),
  )

  /** Mann–Whitney U (Wilcoxon rank-sum) source-vs-rest length test —
    * the nonparametric two-sample screen a curation pipeline runs to
    * spot sources whose document-length DISTRIBUTION departs from the
    * corpus (the distribution-free companion to `ks_drift`'s CDF gap:
    * U is powered for location shifts, KS for any shape change).
    * Because each test pools one source against ALL others, the pooled
    * sample is the whole corpus — so ONE global midrank table serves
    * every per-source test simultaneously.
    *
    * Exactness: ranks live on the VALUE GRAIN (distinct n_chars —
    * bounded, never corpus-sized), doubled to stay integral under ties
    * (2·midrank = 2·|{x<v}| + tie + 1), so U is carried as the exact
    * BIGINT u2 = 2U = Σc·r2 − n1(n1+1). The common-language effect
    * size is one truncating DIV; the tie-corrected normal z is the one
    * float, stated as the IDENTICAL expression text in both engines
    * from exact-integer inputs, ×10³-floored (the `ndcg_eval` shared-
    * chain rule).
    *
    * Scale: one (source, value) grain agg and one value-grain agg are
    * the only corpus-touching steps (both partial+final); the midrank
    * window runs single-partition over the VALUE GRAIN only (the
    * `wow_growth` bounded-grain rule), and every downstream frame is
    * |sources|- or |values|-sized. Accumulators: r1_2 ≤ 2·n1·N — past
    * ~3×10⁹ pooled docs the Σ needs the DECIMAL(38,0) wide tier
    * (`user_type_entropy` knob pattern); gate scales fit BIGINT with
    * room, ANSI fails loudly at the bound.
    */
  private val mannWhitney = DeclaredQuery(
    "mann_whitney",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val x = documents(s, d).select(col("source"), col("n_chars").as("v"))
      val hist = x.groupBy("v").agg(count(lit(1)).as("cnt"))
      // midrank table on the value grain: single-partition window over
      // |distinct lengths| rows only — bounded, never the corpus
      val wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val ranked = hist
        .withColumn("cumlt", coalesce(sum("cnt").over(wv), lit(0L)))
        .withColumn("r2", lit(2L) * col("cumlt") + col("cnt") + lit(1L))
        .select("v", "r2")
      val tot = hist.agg(
        sum("cnt").as("n_total"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie3"),
      )
      documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .join(broadcast(ranked), Seq("v"))
        .groupBy("source")
        .agg(sum("c").as("n1"), sum(col("c") * col("r2")).as("r1_2"))
        .crossJoin(broadcast(tot))
        .withColumn("n2", col("n_total") - col("n1"))
        .withColumn("u2", col("r1_2") - col("n1") * (col("n1") + lit(1L)))
        .withColumn("cle_e6", expr("u2 * 1000000 DIV nullif(2 * n1 * n2, 0)"))
        .withColumn(
          "z_e3",
          expr("""CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
                  CAST(floor(CAST(u2 - n1 * n2 AS DOUBLE)
                    / (2.0 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                        * ((n_total + 1.0) - CAST(tie3 AS DOUBLE) / (CAST(n_total AS DOUBLE) * (n_total - 1.0)))))
                    * 1000.0 + 0.5) AS BIGINT) END"""),
        )
        .select("source", "n1", "n2", "u2", "cle_e6", "z_e3")
        .orderBy("source")
    },
    Some("""WITH x AS (SELECT source, n_chars AS v FROM documents),
            hist AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM x GROUP BY 1),
            ranked AS (SELECT v,
                              2 * coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                              + cnt + 1 AS r2
                       FROM hist),
            tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
                           CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie3
                    FROM hist),
            sv AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
                   FROM documents GROUP BY 1, 2),
            per AS (SELECT source, CAST(sum(c) AS BIGINT) AS n1,
                           CAST(sum(c * r2) AS BIGINT) AS r1_2
                    FROM sv JOIN ranked USING (v) GROUP BY 1),
            f AS (SELECT source, n1, n_total - n1 AS n2,
                         r1_2 - n1 * (n1 + 1) AS u2, n_total, tie3
                  FROM per CROSS JOIN tot)
            SELECT source, n1, n2, u2,
                   (u2 * 1000000) // nullif(2 * n1 * n2, 0) AS cle_e6,
                   CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
                   CAST(floor(CAST(u2 - n1 * n2 AS DOUBLE)
                     / (2.0 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                         * ((n_total + 1.0) - CAST(tie3 AS DOUBLE) / (CAST(n_total AS DOUBLE) * (n_total - 1.0)))))
                     * 1000.0 + 0.5) AS BIGINT) END AS z_e3
            FROM f ORDER BY source"""),
  )

  /** Gini concentration of per-document token counts within each source
    * — the inequality statistic a data-mixing stage reads next to
    * `temperature_mix`: a source near 0 spreads its token budget evenly
    * across documents; one near 1 hides most of its mass in a few giant
    * documents (so a doc-level cap or dedup pass changes its effective
    * weight far more than its doc count suggests). Companion to
    * `zipf_slope` (type-frequency inequality) at the document grain.
    *
    * Exactness: the standard rank form G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx)
    * over ascending ranks. Within a tie group Σi·x = x·Σi regardless of
    * order, so the doc_id tiebreak cannot change the sum — the value is
    * rank-deterministic; one truncating DIV on nonneg integers renders
    * gini_e6 (truncation ≡ floor there, cross-engine safe).
    *
    * Scale: one scan-local token count, one window RANK PARTITIONED BY
    * source (distributed per-source sort — never a global window), one
    * agg. The rank-weighted Σ reaches n²·len per source, so the
    * accumulator is DECIMAL(38,0) with BIGINT out ("BIGINT means out",
    * ANSI-loud past 2⁶³ — the `kmeans_cost` census pattern).
    */
  private val tokenGini = DeclaredQuery(
    "token_gini",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wr = Window.partitionBy("source").orderBy(col("tok"), col("doc_id"))
      documents(s, d)
        .select(col("source"), col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("i", row_number().over(wr).cast("long"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("tok").as("sum_tokens"),
          sum((col("i") * col("tok")).cast("decimal(38,0)")).as("s1"),
        )
        .withColumn(
          "gini_e6",
          expr("""CAST((2 * s1 - (n_docs + 1) * CAST(sum_tokens AS DECIMAL(38,0))) * 1000000
                  DIV (CAST(n_docs AS DECIMAL(38,0)) * sum_tokens) AS BIGINT)"""),
        )
        .select("source", "n_docs", "sum_tokens", "gini_e6")
        .orderBy("source")
    },
    Some("""WITH x AS (SELECT source, doc_id,
                              CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
                       FROM documents),
            r AS (SELECT source, tok,
                         CAST(row_number() OVER (PARTITION BY source ORDER BY tok, doc_id) AS BIGINT) AS i
                  FROM x),
            g AS (SELECT source, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tokens,
                         sum(CAST(i * tok AS HUGEINT)) AS s1
                  FROM r GROUP BY 1)
            SELECT source, n_docs, sum_tokens,
                   CAST((2 * s1 - (n_docs + 1) * sum_tokens) * 1000000
                        // (n_docs * sum_tokens) AS BIGINT) AS gini_e6
            FROM g ORDER BY source"""),
  )

  /** Corpus-level source-diversity profile — the one-row dashboard a
    * mixing stage reads before touching weights: source count,
    * Herfindahl–Hirschman concentration (Σ share² — the "is one crawl
    * eating the corpus" number), its inverse-Simpson effective-source
    * count (the Hill D₂ diversity: how many EQUAL sources the mix
    * behaves like), and the Shannon share entropy. The corpus-grain
    * companion to `token_gini` (within-source inequality) and
    * `temperature_mix` (the corrective action).
    *
    * Exactness: HHI and inverse-Simpson are fully exact — hhi_e6 =
    * Σn_s²·10⁶ DIV N², inv_simpson_e3 = N²·10³ DIV Σn_s², both on
    * DECIMAL(38,0) products (N² crosses 2⁶³ past ~3×10⁹ docs), one
    * truncating division each, BIGINT out. Entropy is the repo µnat
    * spelling (per-source n·ln n ×10⁶-floored before the exact sum).
    *
    * Scale: one (source) grain agg — the only corpus-touching step —
    * then a |sources|-row rollup. Nothing else moves.
    */
  /** The diversity rollup over ANY (source, c) count frame — shared by
    * the declared `source_diversity` and the streaming serve
    * ([[graft.streaming.DocIngest.sourceDiversityFromState]], which
    * feeds it the merged reputation partials' additive doc counts), so
    * batch and stream state the same statistics.
    */
  private[graft] def sourceDiversityFrom(
      counts: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame =
    counts
      .withColumn("term_e6", expr("CAST(floor(c * ln(c) * 1000000.0 + 0.5) AS BIGINT)"))
      .agg(
        count(lit(1)).as("n_sources"),
        sum("c").as("n_docs"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sumsq"),
        sum("term_e6").as("sum_e6"),
      )
      .select(
        col("n_sources"),
        col("n_docs"),
        expr("""CAST((sumsq * 1000000) DIV (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)""")
          .as("hhi_e6"),
        expr("""CAST((CAST(n_docs AS DECIMAL(38,0)) * n_docs * 1000) DIV nullif(sumsq, 0) AS BIGINT)""")
          .as("inv_simpson_e3"),
        expr("""CAST(floor(ln(n_docs) * 1000000.0 + 0.5) AS BIGINT)
                - CAST(floor(CAST(sum_e6 AS DOUBLE) / CAST(n_docs AS DOUBLE) + 0.5) AS BIGINT)""")
          .as("entropy_e6"),
      )
      .orderBy("n_sources")

  private val sourceDiversity = DeclaredQuery(
    "source_diversity",
    (s, d) =>
      sourceDiversityFrom(
        documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("c")),
      ),
    Some("""WITH sc AS (SELECT source, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
            t AS (SELECT c, CAST(floor(c * ln(c) * 1000000.0 + 0.5) AS BIGINT) AS term_e6 FROM sc),
            g AS (SELECT count(*) AS n_sources, CAST(sum(c) AS BIGINT) AS n_docs,
                         sum(CAST(c AS HUGEINT) * c) AS sumsq,
                         CAST(sum(term_e6) AS BIGINT) AS sum_e6
                  FROM t)
            SELECT n_sources, n_docs,
                   CAST((sumsq * 1000000) // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS hhi_e6,
                   CAST((CAST(n_docs AS HUGEINT) * n_docs * 1000) // nullif(sumsq, 0) AS BIGINT) AS inv_simpson_e3,
                   CAST(floor(ln(n_docs) * 1000000.0 + 0.5) AS BIGINT)
                   - CAST(floor(CAST(sum_e6 AS DOUBLE) / n_docs + 0.5) AS BIGINT) AS entropy_e6
            FROM g ORDER BY n_sources"""),
  )

  /** Lorenz-curve decile points of per-document token counts within
    * each source — the CURVE whose area `token_gini` summarizes: the
    * token share held by the bottom k/10 of documents, k = 1..10 (a
    * source whose bottom half holds 5% of tokens caps very differently
    * from one holding 35%). Read with `token_gini` when deciding
    * doc-level caps for mixing.
    *
    * Exactness: ascending (tok, doc_id) ranks per source (tie-order-
    * invariant cumulative sums — equal values commute), decile cut at
    * row ⌊k·n/10⌋, share = cumtok·10⁶ DIV total — all integers, one
    * truncating division. Cuts that floor to row 0 (n < 10) are out by
    * definition.
    *
    * Scale: one scan-local token count, one source-PARTITIONED window
    * (distributed per-source sort), a 10-row broadcast grid. The
    * cumulative Σ rides DECIMAL(38,0) ("BIGINT means out").
    */
  private val lorenzPoints = DeclaredQuery(
    "lorenz_points",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val wr = Window.partitionBy("source").orderBy(col("tok"), col("doc_id"))
      val ranked = documents(s, d)
        .select(col("source"), col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("i", row_number().over(wr).cast("long"))
        .withColumn(
          "cumtok",
          sum(col("tok").cast("decimal(38,0)"))
            .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
      val tot = documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok").cast("decimal(38,0)")).as("st"))
      val grid = (1L to 10L).toDF("decile")
      ranked
        .join(tot, Seq("source"))
        .crossJoin(broadcast(grid))
        .filter(col("i") === expr("(decile * n_docs) DIV 10") && col("i") >= 1L)
        .select(
          col("source"),
          col("decile"),
          col("i").as("docs_cum"),
          expr("CAST((cumtok * 1000000) DIV st AS BIGINT)").as("tok_share_e6"),
        )
        .orderBy("source", "decile")
    },
    Some("""WITH x AS (SELECT source, doc_id,
                              CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
                       FROM documents),
            r AS (SELECT source, doc_id, tok,
                         CAST(row_number() OVER (PARTITION BY source ORDER BY tok, doc_id) AS BIGINT) AS i,
                         sum(CAST(tok AS HUGEINT)) OVER (PARTITION BY source ORDER BY tok, doc_id
                                                         ROWS UNBOUNDED PRECEDING) AS cumtok
                  FROM x),
            tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                           sum(CAST(tok AS HUGEINT)) AS st
                    FROM x GROUP BY 1),
            g AS (SELECT unnest(generate_series(1, 10)) AS decile)
            SELECT r.source, CAST(g.decile AS BIGINT) AS decile, r.i AS docs_cum,
                   CAST((r.cumtok * 1000000) // tot.st AS BIGINT) AS tok_share_e6
            FROM r JOIN tot USING (source) CROSS JOIN g
            WHERE r.i = (g.decile * tot.n_docs) // 10 AND r.i >= 1
            ORDER BY source, decile"""),
  )

  def queries: Seq[DeclaredQuery] =
    Seq(gopherRules, sourceReputation, temperatureMix, tokenFertility, ksDrift,
      ruleModelCrosstab, calibrationBins, scoreQuantileNorm, nucleusCoverage, kAnonymity,
      lDiversity, tCloseness, psiDrift, mannWhitney, tokenGini, sourceDiversity,
      lorenzPoints)
}
