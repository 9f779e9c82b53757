package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._

/** End-to-end pretraining-corpus cleaning — the composition the north
  * star actually runs: quality filter → exact dedup → near-dup removal →
  * token accounting. One declared query so the whole composed pipeline is
  * oracle-verified, not just its stages.
  *
  * Stage semantics (all deterministic):
  *  1. quality: keep docs with ≥ 20 words and uniq_ratio ≥ 0.35
  *     (length/stopword heuristics from TextOps);
  *  2. exact dedup: keep the min-doc_id representative per canonical
  *     word-multiset md5 (shuffle-invariant exact dup);
  *  3. near-dup: compute trigram Jaccard ≥ 0.3 pairs over the full corpus
  *     and drop every doc that appears as the HIGHER id of any pair —
  *     chains collapse to their lowest id;
  *  4. account: per surviving doc, word and BPE-estimate token counts.
  *
  * Scale: stages 1–2 are scan + hash-window (no text shuffled, only
  * hashes); stage 3 reuses the inverted-index candidate join; stage 4 is
  * a projection. The loser set is CORPUS-cardinality at web scale —
  * published LLM pipelines drop 30–50% of documents as near-dups — so
  * the removal anti-join carries no broadcast hint: AQE broadcasts it
  * when it measures small and otherwise shuffles on doc_id, a key
  * `deduped` already paid for its canonical-hash window.
  */
object PipelineOps extends QueryModule {

  private val MinWords = 20
  private val MinUniq = 0.35
  private val MinJ = 0.3

  /** The three cleaning stages as shared frames — `clean_corpus` reads
    * the final one; `curation_funnel` counts each, so the stage
    * definitions cannot drift between the pipeline and its report.
    */
  private def qualityStage(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    documents(s, d)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn(
        "uniq_ratio",
        size(array_distinct(col("ws"))).cast("double") / size(col("ws")),
      )
      .filter(col("n_words") >= MinWords && col("uniq_ratio") >= MinUniq)

  private def exactDedupStage(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    qualityStage(s, d)
      .withColumn("canon", md5(array_join(sort_array(col("ws")), " ")))
      .withColumn(
        "keep",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("canon").orderBy("doc_id"),
        ) === 1,
      )
      .filter(col("keep"))

  private def nearDupCleanStage(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame = {
    val nearDupLosers = DedupOps
      .jaccardPairs(s, d, MinJ, maxDf = Some(DedupOps.DefaultMaxDf))
      .select(col("db").as("doc_id"))
      .distinct()
    exactDedupStage(s, d)
      .join(nearDupLosers, Seq("doc_id"), "left_anti") // no hint: losers are corpus-order at web scale
  }

  private val cleanCorpus = DeclaredQuery(
    "clean_corpus",
    (s, d) => {
      nearDupCleanStage(s, d)
        .select(
          col("doc_id"),
          col("lang"),
          col("n_words"),
          Disp.roundz(col("uniq_ratio"), 4).as("uniq_ratio"),
          ceil(length(col("text")).cast("double") / 4.0).cast("long").as("est_bpe"),
        )
        .orderBy("doc_id")
    },
    Some(s"""WITH ${DedupOps.hashedGramsDuck},
             ${DedupOps.jaccardPairsDuck(MinJ, Some(DedupOps.DefaultMaxDf))},
             losers AS (SELECT DISTINCT db AS doc_id FROM p),
             q AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents),
             q2 AS (SELECT doc_id, lang, text, ws,
                           CAST(len(ws) AS BIGINT) AS n_words,
                           len(list_distinct(ws))::DOUBLE / len(ws) AS uniq_ratio
                    FROM q
                    WHERE len(ws) >= $MinWords
                      AND len(list_distinct(ws))::DOUBLE / len(ws) >= $MinUniq),
             dd AS (SELECT *, row_number() OVER (
                      PARTITION BY md5(array_to_string(list_sort(ws), ' '))
                      ORDER BY doc_id) AS rn
                    FROM q2)
             SELECT doc_id, lang, n_words, round(uniq_ratio, 4) AS uniq_ratio,
                    CAST(ceil(length(text)::DOUBLE / 4.0) AS BIGINT) AS est_bpe
             FROM dd
             WHERE rn = 1 AND doc_id NOT IN (SELECT doc_id FROM losers)
             ORDER BY doc_id"""),
  )

  /** The curation funnel — the stage-by-stage retention counts every
    * published pipeline reports in its data card (raw → heuristic
    * quality → exact dedup → near-dup removal): how many documents
    * survive each stage. The stage frames are the SHARED helpers behind
    * `clean_corpus`, so the report cannot drift from the pipeline it
    * describes. Each stage is one count aggregate (4 driver-bounded
    * rows); at 100 TB the stages share the scan/substrate work and the
    * funnel costs what `clean_corpus` costs, counts only — no text
    * moves for the report.
    */
  private val curationFunnel = DeclaredQuery(
    "curation_funnel",
    (s, d) => {
      val stages = Seq(
        (1L, "raw", documents(s, d)),
        (2L, "quality", qualityStage(s, d)),
        (3L, "exact_dedup", exactDedupStage(s, d)),
        (4L, "near_dup_clean", nearDupCleanStage(s, d)),
      )
      stages
        .map { case (i, name, df) =>
          df.agg(count(lit(1)).as("n_docs"))
            .select(lit(i).as("stage_id"), lit(name).as("stage"), col("n_docs"))
        }
        .reduce(_ unionByName _)
        .orderBy("stage_id")
    },
    Some(s"""WITH ${DedupOps.hashedGramsDuck},
             ${DedupOps.jaccardPairsDuck(MinJ, Some(DedupOps.DefaultMaxDf))},
             losers AS (SELECT DISTINCT db AS doc_id FROM p),
             q AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents),
             q2 AS (SELECT doc_id, ws FROM q
                    WHERE len(ws) >= $MinWords
                      AND len(list_distinct(ws))::DOUBLE / len(ws) >= $MinUniq),
             dd AS (SELECT doc_id, row_number() OVER (
                      PARTITION BY md5(array_to_string(list_sort(ws), ' '))
                      ORDER BY doc_id) AS rn
                    FROM q2)
             SELECT * FROM (
               SELECT CAST(1 AS BIGINT) AS stage_id, 'raw' AS stage,
                      count(*) AS n_docs FROM documents
               UNION ALL
               SELECT CAST(2 AS BIGINT), 'quality', count(*) FROM q2
               UNION ALL
               SELECT CAST(3 AS BIGINT), 'exact_dedup', count(*) FROM dd WHERE rn = 1
               UNION ALL
               SELECT CAST(4 AS BIGINT), 'near_dup_clean', count(*) FROM dd
               WHERE rn = 1 AND doc_id NOT IN (SELECT doc_id FROM losers)
             ) ORDER BY stage_id"""),
  )

  /** Deterministic stratified sampling — carving eval/holdout sets from a
    * corpus with per-stratum rates. The sample decision is a pure
    * function of the key (Knuth multiplicative hash mod 100), not an RNG:
    * re-running at any partitioning, scale, or engine selects the SAME
    * rows — which is what makes a holdout set reproducible and an oracle
    * comparison possible at all (Spark's seeded `sample`/`sampleBy` is
    * partition-dependent and engine-specific). At 100 TB this is a
    * stateless scan predicate: no shuffle, full pushdown. (key·c fits in
    * 64 bits for keys < ~3.4e9; hash the key first for larger domains —
    * DuckDB errors on BIGINT overflow where Spark wraps.)
    */
  private val rates = Seq("en" -> 50, "de" -> 20, "es" -> 20, "fr" -> 10, "zh" -> 10)

  private val stratifiedSample = DeclaredQuery(
    "stratified_sample",
    (s, d) => {
      val bucket = pmod(col("doc_id") * lit(2654435761L), lit(100L))
      val rate = rates.foldLeft(lit(0)) { case (acc, (l, r)) =>
        when(col("lang") === l, lit(r)).otherwise(acc)
      }
      documents(s, d)
        .withColumn("bucket", bucket)
        .filter(col("bucket") < rate)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy("doc_id")
    },
    Some {
      val rateSql = rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
      s"""SELECT doc_id, lang, (doc_id * 2654435761) % 100 AS bucket
         FROM documents
         WHERE (doc_id * 2654435761) % 100 < (CASE $rateSql ELSE 0 END)
         ORDER BY doc_id"""
    },
  )

  /** Examples kept per class by [[perClassExamples]] — an eval-recipe
    * constant (few-shot prompt slots); the plan is k-independent.
    */
  private val ExamplesPerClass = 3

  /** Deterministic per-class example selection — the eval-set
    * construction step (few-shot prompt examples, per-label probe sets):
    * the k lowest-hash documents of every class, ranked by the shared
    * multiplicative hash with doc_id tiebreak. Hash-ranked, not
    * first-k-by-id, so the picks are an unbiased pseudo-random draw yet
    * identical on every run, engine, and partitioning (the
    * `stratified_sample` discipline applied to "k per class" instead of
    * "rate per class").
    *
    * At 100 TB: one class-keyed window — partitions are classes
    * (bounded cardinality, uniform by hash rank), and Spark's
    * WindowGroupLimit pushes the rank<=k cut below the final sort, so
    * per-class work is top-k, not full-sort.
    */
  private val perClassExamples = DeclaredQuery(
    "per_class_examples",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy(col("bucket"), col("doc_id"))
      documents(s, d)
        .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(1000000000L)))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= ExamplesPerClass)
        .select(col("lang"), col("rk"), col("doc_id"), col("bucket"))
        .orderBy("lang", "rk")
    },
    Some(s"""WITH b AS (SELECT lang, doc_id,
                               (doc_id * 2654435761) % 1000000000 AS bucket
                        FROM documents),
             r AS (SELECT lang, doc_id, bucket,
                          CAST(row_number() OVER (PARTITION BY lang
                                                  ORDER BY bucket, doc_id) AS BIGINT) AS rk
                   FROM b)
             SELECT lang, rk, doc_id, bucket FROM r
             WHERE rk <= $ExamplesPerClass ORDER BY lang, rk"""),
  )

  /** Per-slice token budget for [[tokenBudgetMix]] — fixture-scaled
    * (every language slice exceeds it, so both kept and cut docs are
    * exercised); production budgets come from the mixture recipe.
    */
  private val TokenBudget = 2000L

  /** Token-budget source mixing — the mixture stage published recipes
    * (The Pile, Dolma) actually specify: each slice contributes
    * DOCUMENTS UNTIL A TOKEN BUDGET, not a document count or rate
    * (`mix_sources` / `stratified_sample` cover those). Greedy
    * deterministic fill in doc_id order: a document is kept while the
    * running word total BEFORE it is under the slice's budget (the
    * crossing document is included, like a sequence pack), so re-runs at
    * any partitioning select the same prefix.
    *
    * Plan: ONE running-sum window partitioned by the slice key + a
    * stateless predicate — no joins, nothing broadcast. At 100 TB the
    * per-slice window cost is bounded by slice size; a single slice
    * larger than an executor takes the `sequence_pack` two-phase
    * distributed prefix sum (per-partition subtotals + offset join),
    * which is the same arithmetic with one extra narrow exchange. Skew
    * is structural: a hot slice stops contributing past its budget, so
    * the OUTPUT is budget-bounded even when the input is not.
    */
  private val tokenBudgetMix = DeclaredQuery(
    "token_budget_mix",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      documents(s, d)
        .select(
          col("lang"),
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
        )
        .withColumn("cum_before", coalesce(sum("n_words").over(w), lit(0L)))
        .filter(col("cum_before") < TokenBudget)
        .select(
          col("lang"),
          col("doc_id"),
          col("n_words"),
          (col("cum_before") + col("n_words")).as("cum_words"),
        )
        .orderBy("lang", "doc_id")
    },
    Some(s"""WITH t AS (SELECT lang, doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                        FROM documents),
             c AS (SELECT lang, doc_id, n_words,
                          coalesce(sum(n_words) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                   0) AS cum_before
                   FROM t)
             SELECT lang, doc_id, n_words,
                    CAST(cum_before + n_words AS BIGINT) AS cum_words
             FROM c WHERE cum_before < $TokenBudget
             ORDER BY lang, doc_id"""),
  )

  /** Importance-resampling bucket count: DSIR hashes n-grams into a
    * fixed table (10⁴ in the paper); 64 keeps the oracle compact — the
    * shape (corpus-independent D) is what matters to the engine.
    */
  private val DsirBuckets = 64

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling): score every document by how target-like its hashed
    * unigram bag is — the published data-selection stage that picks
    * pretraining data matching a high-quality target distribution.
    * Per-bucket weight λ_b = ln p̂_target(b) − ln p̂_raw(b) over
    * Laplace-smoothed hashed-feature counts (target = the `lang = 'en'`
    * slice, raw = the whole corpus); a document's weight is the exact
    * BIGINT sum of its features' λ (×10⁶-scaled before summing, the
    * `unigram_logprob` discipline, so the distributed aggregation is
    * reorderable and hash-identical cross-engine).
    *
    * At 100 TB: BOTH feature models are fixed-size (D buckets,
    * corpus-independent — the paper's point: a hashed generative model
    * never grows), built with one map-side-combined count each; the
    * λ table is D rows, so the scoring join is a bounded broadcast AQE
    * chooses on its own (no hint — the no-pin rule holds even when the
    * bound is structural), and the per-doc sum is the one doc-keyed
    * shuffle. Raw counts include the target slice (p̂_raw is the
    * corpus marginal), matching the paper's raw-pool formulation.
    */
  /** The per-document DSIR weight frame (doc_id, n_feats, weight_sum),
    * unordered — shared by the declared `dsir_weights` and
    * `dsir_resample`, so the importance model cannot drift between the
    * weights and the sampler that consumes them.
    */
  private def dsirScored(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.SubstrateCache.substrate(s, d, "dsir-weights")(dsirScoredBuild(s, d))

  /** The hashed feature rows of a (doc_id, lang, text) frame —
    * (doc_id, lang, b) with b the poly-hash bucket. Shared by the batch
    * substrate and the streaming partial store so the feature
    * definition (tokenization, hash, bucket count) cannot drift.
    */
  private[graft] def dsirFeats(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(
        col("doc_id"),
        col("lang"),
        explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"),
      )
      .select(
        col("doc_id"),
        col("lang"),
        expr(s"CAST(graft_poly_hash(w) % $DsirBuckets AS INT)").as("b"),
      )
  }

  /** The ADDITIVE model grain: per-bucket (b, tc, rc) counts — target
    * count (lang = en) and raw count from ONE conditional-aggregation
    * pass. Counts are plain sums, so slice-wise partials merge by
    * groupBy-sum to the full-corpus model — the property the continuous
    * DSIR refresh ([[graft.streaming.DocIngest.startDsirPartials]])
    * rides, exactly like the vocabulary partial store.
    */
  private[graft] def dsirBucketCounts(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    dsirFeats(docs)
      .groupBy("b")
      .agg(
        count(when(col("lang") === "en", 1)).as("tc"),
        count(lit(1)).as("rc"),
      )

  /** The ×10⁶-floored log-ratio model table (b, lam) from a merged
    * (b, tc, rc) count frame — the derivation half of the DSIR model,
    * shared verbatim by the batch substrate and the streamed refresh so
    * the smoothing arithmetic cannot drift between them.
    */
  private[graft] def dsirLamFrom(
      s: org.apache.spark.sql.SparkSession,
      cnts: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame =
    s.range(DsirBuckets)
      .select(col("id").cast("int").as("b"))
      .join(cnts, Seq("b"), "left")
      // both totals from ONE aggregate over cnts (1-row scalar)
      .crossJoin(broadcast(cnts.agg(sum("tc").as("tt"), sum("rc").as("rt"))))
      .select(
        col("b"),
        expr(
          s"""CAST(floor((ln(coalesce(tc, 0) + 1) - ln(tt + $DsirBuckets)
             |            - ln(coalesce(rc, 0) + 1) + ln(rt + $DsirBuckets))
             |           * 1000000.0 + 0.5) AS BIGINT)""".stripMargin,
        ).as("lam"),
      )

  private def dsirScoredBuild(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val feats = dsirFeats(documents(s, d))
    val lam = dsirLamFrom(s, dsirBucketCounts(documents(s, d)))
    feats
      .join(lam, Seq("b")) // D-row model table: AQE broadcasts, un-hinted
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("lam").as("weight_sum"))
  }

  /** DuckDB twin of [[dsirScored]] as CTE text, ending in
    * `dw(doc_id, n_feats, weight_sum)`.
    */
  private lazy val dsirDuckCtes: String =
    s"""df AS (SELECT doc_id, lang,
       |              CAST(${graft.operators.TextOps.wordHashDuck} % $DsirBuckets AS INT) AS b
       |       FROM (SELECT doc_id, lang,
       |                    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |             FROM documents)),
       |dt AS (SELECT b, count(*) AS tc FROM df WHERE lang = 'en' GROUP BY b),
       |dr AS (SELECT b, count(*) AS rc FROM df GROUP BY b),
       |dtt AS (SELECT CAST(sum(tc) AS BIGINT) AS tt FROM dt),
       |drt AS (SELECT CAST(sum(rc) AS BIGINT) AS rt FROM dr),
       |dbk AS (SELECT unnest(generate_series(0, ${DsirBuckets - 1})) AS b),
       |dlam AS (SELECT dbk.b,
       |                CAST(floor((ln(coalesce(dt.tc, 0) + 1) - ln(tt + $DsirBuckets)
       |                            - ln(coalesce(dr.rc, 0) + 1) + ln(rt + $DsirBuckets))
       |                           * 1000000.0 + 0.5) AS BIGINT) AS lam
       |         FROM dbk LEFT JOIN dt ON dbk.b = dt.b LEFT JOIN dr ON dbk.b = dr.b, dtt, drt),
       |dw AS (SELECT df.doc_id,
       |              CAST(count(*) AS BIGINT) AS n_feats,
       |              CAST(sum(dlam.lam) AS BIGINT) AS weight_sum
       |       FROM df JOIN dlam ON df.b = dlam.b
       |       GROUP BY 1)""".stripMargin

  private val dsirWeights = DeclaredQuery(
    "dsir_weights",
    (s, d) => {
      dsirScored(s, d)
        // floor(x + 0.5), never round(): round's half-tie mode differs
        // cross-engine (Spark half-up, DuckDB half-even) and the
        // ×10⁶-scaled integer sum lands on exact halves; floor is the
        // same IEEE op in both engines, including for negative values
        // (half rounds toward +inf on both sides). The char_entropy /
        // vocab_js_divergence display discipline.
        .withColumn(
          "avg_logratio",
          expr(
            "CAST(floor(CAST(weight_sum AS DOUBLE) / n_feats / 100.0 + 0.5) / 10000.0 AS DOUBLE)",
          ),
        )
        .orderBy("doc_id")
    },
    Some(s"""WITH $dsirDuckCtes
             SELECT doc_id, n_feats, weight_sum,
                    CAST(floor(CAST(weight_sum AS DOUBLE) / n_feats / 100.0 + 0.5)
                         / 10000.0 AS DOUBLE) AS avg_logratio
             FROM dw ORDER BY doc_id"""),
  )

  /** Sample size for the declared Gumbel-top-k resample. */
  private val DsirSampleK = 100

  /** DSIR importance RESAMPLING — the sampler the weights exist for
    * (Xie et al.: select the pretraining subset by importance weight).
    * Sampling without replacement ∝ exp(weight) is exactly Gumbel
    * top-k: key = avg-logratio + Gumbel(0,1) noise, keep the K largest.
    * The Gumbel variate is DERANDOMIZED — u from the shared avalanche
    * hash of doc_id, g = −ln(−ln(u)) — so the drawn subset is
    * bit-identical across runs, engines and partitionings (resumable
    * data jobs; ablations that differ only where intended), while
    * remaining a faithful Gumbel draw against any hash-independent
    * weight signal. Both the weight arm (shared [[dsirScored]] + CTE
    * chain) and the noise arm are single shared expression texts; the
    * final top-k is a TakeOrderedAndProject over doc-cardinality rows
    * — no corpus shuffle beyond the weight computation it rides.
    */
  private val dsirResample = DeclaredQuery(
    "dsir_resample",
    (s, d) => {
      dsirScored(s, d)
        .withColumn("a", (col("doc_id") * lit(2654435761L)) % lit(2147483647L))
        .withColumn(
          "u_ppm",
          expr("(((a ^ shiftright(a, 7)) * 97381) % 2147483647) % 1000000"),
        )
        .withColumn(
          "key_s",
          expr(
            """CAST(floor((CAST(weight_sum AS DOUBLE) / n_feats / 1000000.0
              |            - ln(-ln((u_ppm + 0.5) / 1000000.0)))
              |           * 1000000.0 + 0.5) AS BIGINT)""".stripMargin,
          ),
        )
        .select("doc_id", "n_feats", "weight_sum", "key_s")
        .orderBy(col("key_s").desc, col("doc_id"))
        .limit(DsirSampleK)
    },
    Some(s"""WITH $dsirDuckCtes,
             g AS (SELECT doc_id, n_feats, weight_sum,
                          ((xor((doc_id * 2654435761) % 2147483647,
                                ((doc_id * 2654435761) % 2147483647) >> 7) * 97381)
                           % 2147483647) % 1000000 AS u_ppm
                   FROM dw)
             SELECT doc_id, n_feats, weight_sum,
                    CAST(floor((CAST(weight_sum AS DOUBLE) / n_feats / 1000000.0
                                - ln(-ln((u_ppm + 0.5) / 1000000.0)))
                               * 1000000.0 + 0.5) AS BIGINT) AS key_s
             FROM g
             ORDER BY key_s DESC, doc_id LIMIT $DsirSampleK"""),
  )

  /** Deterministic corpus rebalancing ("data mixing"): downsample every
    * language slice to the rarest language's share, with the rate
    * COMPUTED from corpus counts rather than declared (the
    * mixing-weights shape of a pretraining pipeline: weights come from
    * corpus statistics; the keep/drop decision must still be a pure row
    * predicate so re-runs and engines agree). The comparison
    * `bucket·cnt_l < 1000·min_cnt` stays in exact BIGINT arithmetic —
    * no rate division ever happens, so there is no float to disagree
    * on. (Keyed by `lang` because the fixture's `source` column is
    * exactly uniform — a filter that never fires proves nothing.)
    *
    * At 100 TB: one count aggregation (tiny result, broadcast back) +
    * a stateless scan predicate — the fact table crosses the wire zero
    * times. Rebalancing to arbitrary target weights is the same plan
    * with `min_cnt` replaced by a per-source target row count.
    */
  private val mixSources = DeclaredQuery(
    "mix_sources",
    (s, d) => {
      val cnts = documents(s, d).groupBy("lang").agg(count(lit(1)).as("cnt"))
      val minCnt = cnts.agg(min(col("cnt")).as("min_cnt"))
      documents(s, d)
        .join(broadcast(cnts), Seq("lang"))
        .crossJoin(broadcast(minCnt)) // 1-row count scalar
        .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(1000L)))
        .filter(col("bucket") * col("cnt") < lit(1000L) * col("min_cnt"))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
            m AS (SELECT min(cnt) AS min_cnt FROM c)
            SELECT doc_id, lang, (doc_id * 2654435761) % 1000 AS bucket
            FROM documents JOIN c USING (lang) CROSS JOIN m
            WHERE (doc_id * 2654435761) % 1000 * cnt < 1000 * min_cnt
            ORDER BY doc_id"""),
  )

  /** Tokens per training sequence for [[sequencePack]] — a model-input
    * constant (2048 matches a common context length); the packing shape
    * is budget-independent.
    */
  private[graft] val PackBudget = 2048L

  /** Sequence packing — the concat-and-split batching step every LLM
    * pretraining pipeline runs between cleaning and training: documents
    * are laid end-to-end in doc_id order and cut into fixed-token-budget
    * training sequences; a document belongs to the pack its FIRST token
    * falls in. Output is the pack manifest (doc count, token total,
    * id range per pack) a loader would consume.
    *
    * The engine question is the GLOBAL RUNNING OFFSET: Spark's bare
    * `Window.orderBy(cum)` with no partition moves the entire corpus to
    * ONE task — the canonical accidental scale-killer. This plan computes
    * the same prefix sum in two phases: slice the doc_id line into
    * [[PackShards]] contiguous ranges by ARITHMETIC on broadcast min/max
    * bounds (not `repartitionByRange`, whose sampled boundaries are
    * nondeterministic AND would have to be computed identically by the
    * two plan branches that consume the sliced frame — a silent
    * dependency on exchange reuse), sum WITHIN each slice (parallel
    * windows), then broadcast the #slices-row per-slice totals back as
    * offsets — every row crosses the wire a bounded number of times and
    * no task ever holds more than its slice. The slicing is a pure row
    * function of (doc_id, bounds), so both branches derive identical
    * pids by construction and the oracle can state the naive
    * single-window cumsum declaratively.
    */
  private val PackShards = 32L

  /** (doc_id, tok, cum) with `cum` the GLOBAL running token total in
    * doc_id order — the two-phase distributed prefix sum shared by both
    * packing variants: arithmetic slicing on broadcast bounds, per-slice
    * windows, broadcast per-slice offsets (see [[sequencePack]]'s
    * scaladoc for why this shape and not a bare global window or
    * `repartitionByRange`).
    */
  private def packedCum(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    packedCumOf(
      documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("tok"),
      ),
    )

  /** The two-phase distributed prefix sum over an arbitrary
    * (doc_id, tok) table — shared by the whitespace-token packers and
    * the BPE-token packer (`sequence_pack_bpe`), so the pack arithmetic
    * cannot drift with the token accounting.
    */
  private def packedCumOf(t: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = t.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val local = t
      .crossJoin(broadcast(bounds)) // 1-row bounds scalar
      .withColumn(
        "pid",
        expr(s"(doc_id - lo) DIV greatest((hi - lo + 1 + ${PackShards - 1}) DIV $PackShards, 1)"),
      )
      .withColumn(
        "cum_local",
        sum("tok").over(Window.partitionBy("pid").orderBy("doc_id")),
      )
    // #partitions rows: the tiny global window here is the POINT — the
    // corpus-sized one above stays partitioned
    val offsets = local
      .groupBy("pid")
      .agg(sum(col("tok")).as("psum"))
      .withColumn(
        "offset",
        coalesce(
          sum("psum").over(Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L),
        ),
      )
      .select("pid", "offset")
    local
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cum", col("cum_local") + col("offset"))
      .select("doc_id", "tok", "cum")
  }

  private val sequencePack = DeclaredQuery(
    "sequence_pack",
    (s, d) => {
      packedCum(s, d)
        .withColumn("pack_id", expr(s"(cum - tok) DIV $PackBudget"))
        .groupBy("pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("tok").as("tok_total"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"),
        )
        .orderBy("pack_id")
    },
    Some(s"""WITH t AS (SELECT doc_id,
                               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok
                        FROM documents),
             c AS (SELECT doc_id, tok,
                          sum(tok) OVER (ORDER BY doc_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                   FROM t),
             p AS (SELECT doc_id, tok, CAST((cum - tok) // $PackBudget AS BIGINT) AS pack_id FROM c)
             SELECT pack_id, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_total,
                    min(doc_id) AS first_doc, max(doc_id) AS last_doc
             FROM p GROUP BY 1 ORDER BY 1"""),
  )

  /** Boundary-splitting sequence packing — the production loader shape:
    * a document that straddles a pack boundary is SPLIT, contributing its
    * tokens to every pack it spans, so every pack's `tok_total` is
    * exactly [[PackBudget]] (the last pack excepted). [[sequencePack]]
    * assigns whole documents to their first-token pack and so can
    * overflow the budget; real pretraining loaders split or truncate at
    * the boundary — this variant is the split form.
    *
    * The span is derived arithmetically from the same two-phase prefix
    * sum: a doc occupying global token interval [cum−tok, cum) touches
    * packs ⌊(cum−tok)/B⌋ .. ⌊(cum−1)/B⌋ and is exploded into one row per
    * touched pack via `explode(sequence(...))` — the range→rows pattern
    * of X1 (reference onefs.py:1192-1196). Each slice's token count is
    * interval intersection: `least(cum, (p+1)·B) − greatest(cum−tok, p·B)`.
    * At 100 TB the explode fan-out is bounded: Σ spans = Σ tok/B + #docs
    * rows, and no task holds more than its slice of the doc_id line —
    * the same scale argument as [[sequencePack]], plus a per-row bounded
    * generator. `n_docs` counts doc SLICES (a straddling doc counts in
    * each pack it touches).
    */
  private val sequencePackSplit = DeclaredQuery(
    "sequence_pack_split",
    (s, d) => {
      packedCum(s, d)
        .withColumn(
          "pack_id",
          explode(expr(s"sequence((cum - tok) DIV $PackBudget, (cum - 1) DIV $PackBudget)")),
        )
        .withColumn(
          "slice_tok",
          expr(s"least(cum, (pack_id + 1) * $PackBudget)" +
            s" - greatest(cum - tok, pack_id * $PackBudget)"),
        )
        .groupBy("pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("slice_tok").as("tok_total"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"),
        )
        .orderBy("pack_id")
    },
    Some(s"""WITH t AS (SELECT doc_id,
                               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok
                        FROM documents),
             c AS (SELECT doc_id, tok,
                          CAST(sum(tok) OVER (ORDER BY doc_id
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                   FROM t),
             e AS (SELECT doc_id, tok, cum,
                          unnest(range((cum - tok) // $PackBudget,
                                       (cum - 1) // $PackBudget + 1)) AS pack_id
                   FROM c),
             sl AS (SELECT pack_id, doc_id,
                           least(cum, (pack_id + 1) * $PackBudget)
                           - greatest(cum - tok, pack_id * $PackBudget) AS slice_tok
                    FROM e)
             SELECT pack_id, count(*) AS n_docs, CAST(sum(slice_tok) AS BIGINT) AS tok_total,
                    min(doc_id) AS first_doc, max(doc_id) AS last_doc
             FROM sl GROUP BY 1 ORDER BY 1"""),
  )

  /** Sliding-window chunk geometry: [[ChunkWindow]]-token chunks every
    * [[ChunkStride]] tokens (16-token overlap) — the standard RAG /
    * retrieval-indexing split, a LAYOUT property like [[PackBudget]]
    * (production tunes both to the embedder's context; the census
    * arithmetic is parameterized, never hard-coded to the data).
    */
  private val ChunkWindow = 64L
  private val ChunkStride = 48L

  /** Sliding-window chunk census — the audit a retrieval-indexing
    * pipeline runs before embedding a corpus: per language, how many
    * overlapping [[ChunkWindow]]-token chunks at [[ChunkStride]] stride
    * the documents produce, the token inflation the overlap costs
    * (`chunk_tok` vs `doc_tok` — each overlap re-embeds W−S tokens),
    * and how many trailing chunks run short. Complements the packers:
    * `sequence_pack_split` tiles the GLOBAL token line for pretraining
    * loaders; chunking tiles EACH DOCUMENT independently for retrieval,
    * so it needs no prefix sum at all.
    *
    * A doc of `tok` tokens yields 1 chunk when tok ≤ W, else
    * ⌈(tok−W)/S⌉+1; chunk i covers [i·S, min(i·S+W, tok)) — the last
    * chunk is short, never empty (ctok ≥ W−S+1). At 100 TB this is
    * embarrassingly parallel: per-row bounded explode (Σ tok/S + #docs
    * rows — the `sequence_pack_split` fan-out argument), map-side
    * combine collapses to one row per (partition, lang) before the
    * language-cardinality exchange; per-doc counts never shuffle.
    */
  private val chunkCensus = DeclaredQuery(
    "chunk_census",
    (s, d) => {
      documents(s, d)
        .select(
          col("lang"),
          size(split(col("text"), "\\s+")).cast("long").as("tok"),
        )
        .withColumn(
          "n_chunks",
          expr(
            s"IF(tok <= $ChunkWindow, 1L," +
              s" (tok - $ChunkWindow + $ChunkStride - 1) DIV $ChunkStride + 1L)",
          ),
        )
        .withColumn("i", explode(expr("sequence(0L, n_chunks - 1L)")))
        .withColumn("ctok", expr(s"least(CAST($ChunkWindow AS BIGINT), tok - i * $ChunkStride)"))
        .groupBy("lang")
        .agg(
          sum(when(col("i") === 0L, 1L).otherwise(0L)).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(when(col("i") === 0L, col("tok")).otherwise(0L)).as("doc_tok"),
          sum("ctok").as("chunk_tok"),
          sum(when(col("ctok") < ChunkWindow, 1L).otherwise(0L)).as("short_chunks"),
        )
        .orderBy("lang")
    },
    Some(s"""WITH t AS (SELECT lang,
                               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok
                        FROM documents),
             c AS (SELECT lang, tok,
                          CASE WHEN tok <= $ChunkWindow THEN 1
                               ELSE (tok - $ChunkWindow + $ChunkStride - 1) // $ChunkStride + 1
                          END AS n_chunks
                   FROM t),
             e AS (SELECT lang, tok, unnest(range(0, n_chunks)) AS i FROM c),
             sl AS (SELECT lang, tok, i, least($ChunkWindow, tok - i * $ChunkStride) AS ctok FROM e)
             SELECT lang,
                    CAST(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
                    CAST(count(*) AS BIGINT) AS n_chunks,
                    CAST(sum(CASE WHEN i = 0 THEN tok ELSE 0 END) AS BIGINT) AS doc_tok,
                    CAST(sum(ctok) AS BIGINT) AS chunk_tok,
                    CAST(sum(CASE WHEN ctok < $ChunkWindow THEN 1 ELSE 0 END) AS BIGINT) AS short_chunks
             FROM sl GROUP BY lang ORDER BY lang"""),
  )

  /** Shard count for the declared shuffle — a LAYOUT property like
    * `JoinBuckets`: 8 matches testdata scale, production uses
    * O(corpus / target-shard-size). The assignment arithmetic is
    * shard-count-parameterized, never hard-coded to the data.
    */
  private val ShuffleShards = 8

  /** Deterministic global corpus shuffle — the training-order
    * randomization every loader needs, made REPRODUCIBLE: instead of
    * `orderBy(rand())` (nondeterministic across runs/partitionings AND a
    * single global range sort), each document hashes to a shard and a
    * within-shard rank via the shared avalanche chain (the
    * `distinct_sketch` bucket function — same integer arithmetic both
    * engines state). Re-running at any partitioning yields the identical
    * order, so a training run is exactly resumable and ablations see the
    * same data order.
    *
    * At 100 TB: ONE narrow exchange on `shard` plus per-shard sorts that
    * parallelize across shards (each window partition is
    * corpus/ShuffleShards — thousands of shards keep them executor-
    * sized); shard = output file, so this is also the write layout. The
    * hash stages stay below 2⁶³ (DuckDB errors on BIGINT overflow where
    * Spark wraps).
    */
  /** Jensen–Shannon divergence of every language slice's unigram
    * distribution against the target (`en`) slice — the standard
    * distribution-shift monitor a mixture pipeline watches (is this
    * source drifting away from the target distribution the weights were
    * tuned for?). JS is symmetric and bounded by ln 2, so slices are
    * comparable on one scale; the `en` row is the 0 self-check.
    *
    * Determinism: p and q are double ratios of exact counts, each
    * per-(slice, word) JS term is stated as IDENTICAL expression text
    * in both engines (same parse → same IEEE op order) and floored to
    * ×10⁹ BIGINT BEFORE the per-slice sum — term order cannot matter.
    * Display value via floor(x + 0.5), never round() (the half-tie
    * lesson from `char_entropy`).
    *
    * At 100 TB: one (slice, word) count aggregation — vocab-cardinality
    * rows, map-side combined; the term grid is slices × union-vocab
    * rows joined un-hinted (AQE decides; a web-scale vocab would
    * shuffle on `w`, the key the counts already paid for), and the
    * final reduction is slices-cardinality. The text never shuffles.
    */
  private val vocabJsDivergence = DeclaredQuery(
    "vocab_js_divergence",
    (s, d) => {
      val toks = documents(s, d)
        .select(col("lang"), explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
      val cl = toks.groupBy("lang", "w").agg(count(lit(1)).as("c"))
      val tl = cl.groupBy("lang").agg(sum("c").as("t"))
      val ce = cl.filter(col("lang") === "en").select(col("w"), col("c").as("ce"))
      val te = tl.filter(col("lang") === "en").select(col("t").as("te"))
      val grid = tl.select("lang").crossJoin(cl.select("w").distinct())
      val term = expr(
        """CAST(floor((
          |  CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
          |+ CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END
          |) * 1000000000.0 + 0.5) AS BIGINT)""".stripMargin,
      )
      grid
        .join(cl, Seq("lang", "w"), "left")
        .join(ce, Seq("w"), "left") // vocab-cardinality joins: un-hinted
        .join(broadcast(tl), Seq("lang")) // slice-count totals
        .crossJoin(broadcast(te)) // 1-row target total
        .withColumn("p", expr("CAST(coalesce(c, 0) AS DOUBLE) / t"))
        .withColumn("q", expr("CAST(coalesce(ce, 0) AS DOUBLE) / te"))
        .withColumn("term", term)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_terms"), sum("term").as("js_scaled"))
        .withColumn("js", expr("CAST(floor(CAST(js_scaled AS DOUBLE) / 1000.0 + 0.5) / 1000000.0 AS DOUBLE)"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
                          FROM documents),
            cl AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY 1, 2),
            tl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cl GROUP BY 1),
            ce AS (SELECT w, c AS ce FROM cl WHERE lang = 'en'),
            te AS (SELECT t AS te FROM tl WHERE lang = 'en'),
            grid AS (SELECT tl.lang, v.w FROM tl CROSS JOIN (SELECT DISTINCT w FROM cl) v),
            pq AS (SELECT g.lang, g.w,
                          CAST(coalesce(cl.c, 0) AS DOUBLE) / tl.t AS p,
                          CAST(coalesce(ce.ce, 0) AS DOUBLE) / te.te AS q
                   FROM grid g
                   LEFT JOIN cl ON g.lang = cl.lang AND g.w = cl.w
                   LEFT JOIN ce ON g.w = ce.w
                   JOIN tl ON g.lang = tl.lang
                   CROSS JOIN te),
            terms AS (SELECT lang,
                             CAST(floor((
                               CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
                             + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END
                             ) * 1000000000.0 + 0.5) AS BIGINT) AS term
                      FROM pq)
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(sum(term) AS BIGINT) AS js_scaled,
                   floor(CAST(sum(term) AS BIGINT)::DOUBLE / 1000.0 + 0.5) / 1000000.0 AS js
            FROM terms GROUP BY 1 ORDER BY 1"""),
  )

  /** Sequence packing by REAL tokenizer counts — the composition the
    * BPE encoder exists for: per-document token counts come from the
    * trained merge list (encoder runs once per DISTINCT vocab word,
    * [[BpeOps.bpeWordTokenCounts]]; the per-doc sum is one un-hinted
    * vocab join + doc agg), then the SAME two-phase distributed prefix
    * sum as `sequence_pack` assigns packs — so the loader's pack
    * boundaries line up with what the training run actually consumes,
    * not the whitespace proxy (`sequence_pack` keeps the proxy form;
    * BpeSpec brackets how far apart they can drift). Shares
    * [[packedCumOf]], so pack arithmetic cannot diverge between token
    * accountings.
    */
  private val sequencePackBpe = DeclaredQuery(
    "sequence_pack_bpe",
    (s, d) => {
      val wt = BpeOps.bpeWordTokenCounts(s, d)
      val t = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .join(wt, Seq("w")) // un-hinted: vocab-cardinality, AQE decides
        .groupBy("doc_id")
        .agg(sum("wtok").as("tok"))
      packedCumOf(t)
        .withColumn("pack_id", expr(s"(cum - tok) DIV $PackBudget"))
        .groupBy("pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("tok").as("tok_total"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"),
        )
        .orderBy("pack_id")
    }, {
      val sep = "chr(1)"
      Some(s"""WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
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
           dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
           t AS (SELECT doc_id, CAST(sum(wt.wtok) AS BIGINT) AS tok
                 FROM dw JOIN wt USING (w) GROUP BY 1),
           c AS (SELECT doc_id, tok,
                        sum(tok) OVER (ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM t),
           p AS (SELECT doc_id, tok, CAST((cum - tok) // $PackBudget AS BIGINT) AS pack_id FROM c)
           SELECT pack_id, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_total,
                  min(doc_id) AS first_doc, max(doc_id) AS last_doc
           FROM p GROUP BY 1 ORDER BY 1""")
    },
  )

  private val corpusShuffle = DeclaredQuery(
    "corpus_shuffle",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      documents(s, d)
        .withColumn("a", (col("doc_id") * lit(2654435761L)) % lit(2147483647L))
        .withColumn("h", expr("((a ^ shiftright(a, 7)) * 97381) % 2147483647"))
        .withColumn("shard", pmod(col("h"), lit(ShuffleShards)).cast("long"))
        .withColumn(
          "ord",
          row_number()
            .over(Window.partitionBy("shard").orderBy(col("h"), col("doc_id")))
            .cast("long"),
        )
        .select("doc_id", "shard", "ord")
        .orderBy("shard", "ord")
    },
    Some(s"""WITH b AS (SELECT doc_id, (doc_id * 2654435761) % 2147483647 AS a FROM documents),
             c AS (SELECT doc_id, (xor(a, a >> 7) * 97381) % 2147483647 AS h FROM b)
             SELECT doc_id,
                    CAST(h % $ShuffleShards AS BIGINT) AS shard,
                    CAST(row_number() OVER (PARTITION BY h % $ShuffleShards
                                            ORDER BY h, doc_id) AS BIGINT) AS ord
             FROM c ORDER BY shard, ord"""),
  )

  /** Length-bucketed batching audit — the inference/training-efficiency
    * twin of `sequence_pack`: bucket documents by pad-to-next-power-of-2
    * token length (the bucketing dynamic-batching serving stacks and
    * length-grouped training samplers use) and account the padding each
    * bucket wastes. `waste_ppm` is the fraction of a bucket's padded
    * token slots that hold padding, ×10⁶ integer-exact.
    *
    * Plan: the bucket cap is a scan-local CASE over the token count
    * (integer comparisons only — no cross-engine log2 doubles), then one
    * partial+final hash agg over ≤5 buckets and a bounded sort. Shuffle
    * carries (cap, 3 BIGINTs) per partition — corpus-independent, the
    * same mergeable-state shape as `salted_agg`. At 100 TB this is a
    * metadata scan: only token counts are read if lengths are stored
    * columnar (here the split is the stand-in tokenizer).
    */
  private val lengthBuckets = DeclaredQuery(
    "length_buckets",
    (s, d) =>
      documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn(
          "cap",
          when(col("n_tokens") <= 16, 16L)
            .when(col("n_tokens") <= 32, 32L)
            .when(col("n_tokens") <= 64, 64L)
            .when(col("n_tokens") <= 128, 128L)
            .otherwise(256L),
        )
        .groupBy("cap")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("real_tokens"),
          (sum(col("cap") - col("n_tokens"))).as("pad_tokens"),
        )
        .withColumn(
          "waste_ppm",
          expr("CAST(floor(CAST(pad_tokens AS DOUBLE) * 1000000.0 / (cap * n_docs) + 0.5) AS BIGINT)"),
        )
        .orderBy("cap"),
    Some("""WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                       FROM documents),
            b AS (SELECT n_tokens,
                         CASE WHEN n_tokens <= 16 THEN 16
                              WHEN n_tokens <= 32 THEN 32
                              WHEN n_tokens <= 64 THEN 64
                              WHEN n_tokens <= 128 THEN 128
                              ELSE 256 END AS cap
                  FROM t)
            SELECT CAST(cap AS BIGINT) AS cap, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
                   CAST(sum(cap - n_tokens) AS BIGINT) AS pad_tokens,
                   CAST(floor(CAST(sum(cap - n_tokens) AS DOUBLE) * 1000000.0
                              / (cap * count(*)) + 0.5) AS BIGINT) AS waste_ppm
            FROM b GROUP BY cap ORDER BY cap"""),
  )

  /** Effective sample size of the DSIR importance weights, per source —
    * THE diagnostic importance sampling is judged by (Kong 1992:
    * ESS = (Σw)²/Σw²; as a fraction of n it says how many of a source's
    * documents the weighted resample effectively keeps — a collapsed
    * source (few huge weights) reads near 0, a flat one near 1000).
    * Weights are exp(avg logratio) ×10⁶-floored to exact integers (the
    * shared dsir substrate + one expression text in both engines), the
    * two power sums are exact wide-tier integers (DECIMAL(38,0) ≡
    * HUGEINT; past ~10¹¹ max-weight docs per source the sum fails
    * loudly UNDER AN ANSI SESSION — Spark's decimal aggregate overflow
    * returns NULL silently when `spark.sql.ansi.enabled` is off, so
    * loudness here is session config, not intrinsic; the test session
    * asserts ANSI on (Round12OpsSpec precedent) and production must do
    * the same to keep the guarantee. Production shards ESS per source
    * exactly as declared here), and the one defined division chain runs in doubles
    * from identical exact inputs. One doc-keyed join + one
    * source-cardinality agg on the cached weight substrate.
    */
  private val dsirEss = DeclaredQuery(
    "dsir_ess",
    (s, d) => {
      dsirScored(s, d)
        .join(documents(s, d).select("doc_id", "source"), Seq("doc_id"))
        .withColumn(
          "w_e6",
          expr(
            "CAST(floor(exp(CAST(weight_sum AS DOUBLE) / n_feats / 1000000.0)" +
              " * 1000000.0 + 0.5) AS BIGINT)",
          ),
        )
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("w_e6").cast("decimal(38,0)")).as("sw"),
          sum((col("w_e6").cast("decimal(38,0)") * col("w_e6")).cast("decimal(38,0)")).as("sww"),
        )
        .select(
          col("source"),
          col("n_docs"),
          expr(
            "CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE)" +
              " / CAST(n_docs AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)",
          ).as("ess_frac_e3"),
        )
        .orderBy("source")
    },
    Some(s"""WITH $dsirDuckCtes,
             dwv AS (SELECT doc.source,
                            CAST(floor(exp(CAST(dw.weight_sum AS DOUBLE) / dw.n_feats / 1000000.0)
                                       * 1000000.0 + 0.5) AS BIGINT) AS w_e6
                     FROM dw JOIN documents doc ON dw.doc_id = doc.doc_id),
             agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                            CAST(sum(w_e6) AS HUGEINT) AS sw,
                            CAST(sum(CAST(w_e6 AS HUGEINT) * w_e6) AS HUGEINT) AS sww
                     FROM dwv GROUP BY 1)
             SELECT source, n_docs,
                    CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE)
                               / CAST(n_docs AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS ess_frac_e3
             FROM agg ORDER BY source"""),
  )

  /** Heaps-law curve — distinct vocabulary types seen by the time the
    * global token line reaches {10,25,50,75,100}% of its length: the
    * growth curve that says whether a corpus is still yielding new
    * vocabulary (types ∝ tokens^β, β≈0.5 for natural text) or has gone
    * repetitive — the signal vocab-budget and dedup decisions read
    * together. The token line is the packers' SHARED two-phase
    * distributed prefix sum ([[packedCumOf]] — no global window), each
    * token's global position is pure row arithmetic (cum − tok + pos),
    * first occurrence is ONE vocab-cardinality min-agg (map-side
    * combine), and the 5-row threshold grid rides a broadcast. Text is
    * exploded once and reduced immediately to (word, min gpos) — the
    * corpus never shuffles as text. Empty tokens (consecutive spaces)
    * keep their POSITION in the token line but are excluded as
    * vocabulary TYPES — the same type definition `zipf_slope` uses, so
    * the two vocabulary-curve queries share one tokenization contract.
    */
  private val heapsLaw = DeclaredQuery(
    "heaps_law",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"), split(col("text"), " ").as("ws"))
      val cum = packedCumOf(docs.select(col("doc_id"), size(col("ws")).cast("long").as("tok")))
      val firstPos = docs
        .join(cum, Seq("doc_id")) // un-hinted: both sides corpus-cardinality, doc_id-keyed
        .select(col("cum"), col("tok"), posexplode(col("ws")).as(Seq("pos", "w")))
        .select(col("w"), (col("cum") - col("tok") + col("pos") + lit(1L)).as("gpos"))
        .filter(col("w") =!= "") // same type definition as zipf_slope: '' is not a vocabulary type
        .groupBy("w")
        .agg(min("gpos").as("fp"))
      val grid = cum
        .agg(max("cum").as("n"))
        .select(explode(expr("array(10L, 25L, 50L, 75L, 100L)")).as("pct"), col("n"))
        .withColumn("t", expr("n * pct DIV 100"))
        .select("pct", "t")
      firstPos
        .crossJoin(broadcast(grid)) // 5-row threshold grid
        .filter(col("fp") <= col("t"))
        .groupBy("pct", "t")
        .agg(count(lit(1)).as("types"))
        .select(col("pct"), col("t").as("token_threshold"), col("types"))
        .orderBy("pct")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            c AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS tok,
                         CAST(sum(len(ws)) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                  FROM t),
            w AS (SELECT unnest(ws) AS w, cum - tok + generate_subscripts(ws, 1) AS gpos FROM c),
            f AS (SELECT w, min(gpos) AS fp FROM w WHERE w <> '' GROUP BY 1),
            n AS (SELECT max(cum) AS n FROM c),
            g AS (SELECT CAST(pct AS BIGINT) AS pct, CAST((n.n * pct) // 100 AS BIGINT) AS t
                  FROM (VALUES (10), (25), (50), (75), (100)) v(pct) CROSS JOIN n)
            SELECT g.pct, g.t AS token_threshold, count(*) AS types
            FROM g JOIN f ON f.fp <= g.t
            GROUP BY 1, 2 ORDER BY 1"""),
  )

  /** Loader-efficiency histogram over the whole-doc packer — the
    * dashboard that says whether `sequence_pack`'s greedy assignment
    * wastes budget (underfilled packs → padding; the split packer fills
    * exactly and doesn't need this): per fill-percent decile, pack
    * count and the min/max fill. Fill can exceed 100% (a straddling doc
    * lands whole in its first pack), so the top bucket is capped at 12
    * (≥120%) to keep the histogram bounded regardless of document-length
    * tails. Same shared prefix-sum substrate and pack arithmetic as the
    * packers (identical pack ids by construction), one pack-cardinality
    * agg on top.
    */
  private val packEfficiency = DeclaredQuery(
    "pack_efficiency",
    (s, d) => {
      packedCum(s, d)
        .withColumn("pack_id", expr(s"(cum - tok) DIV $PackBudget"))
        .groupBy("pack_id")
        .agg(sum("tok").as("tok_total"))
        .withColumn("fill_pct", expr(s"tok_total * 100 DIV $PackBudget"))
        .withColumn("decile", expr("least(fill_pct DIV 10, 12L)"))
        .groupBy("decile")
        .agg(
          count(lit(1)).as("n_packs"),
          min("fill_pct").as("min_fill_pct"),
          max("fill_pct").as("max_fill_pct"),
        )
        .orderBy("decile")
    },
    Some(s"""WITH t AS (SELECT doc_id,
                               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok
                        FROM documents),
             c AS (SELECT doc_id, tok,
                          sum(tok) OVER (ORDER BY doc_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                   FROM t),
             g AS (SELECT CAST((cum - tok) // $PackBudget AS BIGINT) AS pack_id,
                          tok FROM c),
             f AS (SELECT pack_id, CAST(sum(tok) AS BIGINT) AS tok_total FROM g GROUP BY 1),
             b AS (SELECT least((tok_total * 100 // $PackBudget) // 10, 12) AS decile,
                          (tok_total * 100) // $PackBudget AS fill_pct
                   FROM f)
             SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_packs,
                    CAST(min(fill_pct) AS BIGINT) AS min_fill_pct,
                    CAST(max(fill_pct) AS BIGINT) AS max_fill_pct
             FROM b GROUP BY 1 ORDER BY 1"""),
  )

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006),
    * the one-pass k-sample the mixing family lacks: `stratified_sample`
    * fixes per-stratum counts and `dsir_resample` thresholds importance
    * weights, but "draw k documents with probability ∝ token count" is
    * the A-ES key trick — key = ln(u)/w with u ∈ (0,1) per-item, take
    * the k LARGEST keys (u^(1/w) order ≡ ln(u)/w order since ln u < 0),
    * which is provably a weight-proportional sample, runs as one scan +
    * top-k, and is reproducible because u derives from the shared
    * Knuth-hash spelling, not a PRNG.
    *
    * Determinism: w is the exact token count; u = (h + 0.5)/2³¹ from
    * BIGINT h — identical doubles in both engines; ln and the divide
    * are the shared-text float chain, ×10⁹-floored for display. The
    * top-k sort orders on the RAW key text with doc_id tiebreak.
    *
    * Scale: one corpus scan ending in TakeOrderedAndProject — the
    * `bm25_rank` shape; no shuffle of the corpus, no PRNG state.
    */
  private val WsK = 100
  private val weightedSample = DeclaredQuery(
    "weighted_sample",
    (s, d) => {
      val keyed = documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
        .filter(col("tok") > 0L)
        .withColumn("h", (col("doc_id") * lit(2654435761L)) % lit(2147483647L))
        .withColumn(
          "key",
          expr("ln((CAST(h AS DOUBLE) + 0.5) / 2147483647.0) / CAST(tok AS DOUBLE)"),
        )
      keyed
        .orderBy(col("key").desc, col("doc_id"))
        .limit(WsK)
        .withColumn(
          "rank",
          row_number()
            .over(org.apache.spark.sql.expressions.Window.orderBy(col("key").desc, col("doc_id")))
            .cast("long"),
        )
        .select(
          col("rank"),
          col("doc_id"),
          col("tok"),
          expr("CAST(floor(key * 1000000000.0 + 0.5) AS BIGINT)").as("key_e9"),
        )
        .orderBy("rank")
    },
    Some(s"""WITH x AS (SELECT doc_id,
                               CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
                        FROM documents),
             k AS (SELECT doc_id, tok,
                          ln((CAST((doc_id * 2654435761) % 2147483647 AS DOUBLE) + 0.5) / 2147483647.0)
                            / CAST(tok AS DOUBLE) AS key
                   FROM x WHERE tok > 0),
             r AS (SELECT doc_id, tok, key,
                          CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rank
                   FROM k)
             SELECT rank, doc_id, tok,
                    CAST(floor(key * 1000000000.0 + 0.5) AS BIGINT) AS key_e9
             FROM r WHERE rank <= $WsK ORDER BY rank"""),
  )

  val queries: Seq[DeclaredQuery] =
    Seq(cleanCorpus, stratifiedSample, mixSources, sequencePack, sequencePackSplit,
      chunkCensus, corpusShuffle, dsirWeights, dsirResample, tokenBudgetMix,
      sequencePackBpe, vocabJsDivergence, curationFunnel, perClassExamples, lengthBuckets,
      heapsLaw, dsirEss, packEfficiency, weightedSample)
}
