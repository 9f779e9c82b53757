package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Retrieval-flavoured corpus operators a training-data pipeline runs
  * between dedup and export: benchmark decontamination (drop training
  * documents that leak evaluation content) and per-document TF-IDF
  * keyword extraction. Both are declared oracle-backed queries over the
  * `documents` table and both reuse the shared trigram-shingle substrate
  * from [[DedupOps]] (the signature-store pattern), so the per-word hash
  * work runs once per session+dataset across the whole dedup/retrieval
  * family.
  *
  * Scale notes (100 TB):
  *  - `contamination_check` is the canonical eval-leakage scan: the
  *    benchmark side is an eval suite (thousands of documents, millions
  *    of shingles at most), so its distinct-shingle set broadcasts and
  *    the corpus side never shuffles — one scan, map-side semi-join,
  *    then a per-doc count. At sizes past broadcast range the same plan
  *    degrades gracefully to a shuffled semi-join on the 8-byte shingle
  *    hash (or a `bloom_filter_agg` prefilter with exact confirm); the
  *    corpus text itself never moves either way.
  *  - `tfidf_keywords` shuffles (doc_id, term) pairs for tf, then joins
  *    the df table back on term with NO broadcast hint: the df table is
  *    vocabulary-sized, and web-corpus vocabularies (typos, URLs,
  *    unicode junk) run 10⁸–10¹⁰ terms — corpus-cardinality, not
  *    dimension-cardinality. AQE broadcasts it when it measures small
  *    and falls back to a shuffled join on `term` (a narrow two-column
  *    table) when it doesn't; a pinned hint would instead force an
  *    unbounded driver collect. The per-doc top-k window partitions by
  *    doc_id (uniform, no skew).
  *
  * Cross-engine determinism: idf is materialized as
  * `floor(1e6·ln(N/df) + 0.5)` BIGINT — scores become exact integer
  * products (tf·idf_scaled), so ranking and hashing agree bit-for-bit
  * between Spark and DuckDB (same trick as the SQ8 BIGINT code dots);
  * a last-ulp `ln` divergence would need to land within 1e-9 of an
  * integer boundary to flip the floor.
  */
object RetrievalOps extends QueryModule {

  /** The held-out "benchmark" slice of the corpus: one source tag. On
    * the synthetic fixtures src0 is 5% of documents at every sf — the
    * right shape (benchmark ≪ corpus) for the broadcast plan.
    */
  private[graft] val BenchmarkSource = "src0"

  /** The benchmark slice's distinct shingle-hash set — small by
    * construction (an eval suite), broadcast by every consumer. Derived
    * from the shared gram substrate, so repeated screens (batch query,
    * streaming ingest batches) never re-hash the benchmark.
    */
  /** The benchmark slice's doc ids — the ONE relation in this family
    * that is bounded by construction (an eval suite is thousands of
    * documents, never corpus-sized), so it is the only thing this module
    * ever pins under a `broadcast()` hint.
    */
  private[graft] def benchmarkDocIds(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    documents(s, d)
      .filter(col("source") === BenchmarkSource)
      .select("doc_id")

  private[graft] def benchmarkGrams(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    DedupOps
      .gramRows(s, d)
      .join(broadcast(benchmarkDocIds(s, d)), Seq("doc_id"), "left_semi")
      .select("gh")
      .distinct()

  /** Per-doc leaked-shingle counts of `grams` (doc_id, n, gh — distinct
    * per doc) against a benchmark shingle set: the screening tail shared
    * by the declared batch query and the streaming ingest screen
    * ([[graft.streaming.DocIngest.startScreen]]), so the decontamination
    * definition cannot drift between the two paths.
    */
  private[graft] def leakedCounts(
      grams: org.apache.spark.sql.DataFrame,
      bench: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame =
    grams
      .join(broadcast(bench), Seq("gh"))
      .groupBy("doc_id", "n")
      .agg(count(lit(1)).as("n_leaked"))
      .select(
        col("doc_id"),
        col("n").cast("long").as("n_grams"),
        col("n_leaked"),
        (col("n_leaked").cast("double") / col("n")).as("contamination"),
      )
      .orderBy("doc_id")

  /** Benchmark decontamination: flag every non-benchmark document that
    * shares at least one word-trigram shingle with the benchmark slice,
    * with the leaked-shingle count and contamination ratio. Pipeline
    * placement: after near-dup removal, before export — exactly the
    * n-gram-overlap decontamination step of public LLM data recipes.
    *
    * Physical shape: gram substrate → anti-join against the broadcast
    * BENCHMARK doc-id set (the bounded-by-construction side — never the
    * corpus-side (doc_id, source) dim, which after the `≠ benchmark`
    * filter is 95% of the corpus and must not sit under a broadcast) →
    * distinct benchmark shingle set (broadcast) → equi-join + per-doc
    * count. The shingle hashes are already distinct per document in the
    * substrate, so `count(*)` per doc IS the distinct leaked-gram count.
    */
  private val contaminationCheck = DeclaredQuery(
    "contamination_check",
    (s, d) => {
      val corpusGrams = DedupOps
        .gramRows(s, d)
        .join(broadcast(benchmarkDocIds(s, d)), Seq("doc_id"), "left_anti")
      leakedCounts(corpusGrams, benchmarkGrams(s, d))
    },
    Some(s"""WITH ${DedupOps.hashedGramsDuck},
             e AS (SELECT h.doc_id, d.source, len(ghs) AS n, unnest(ghs) AS gh
                   FROM h JOIN documents d USING (doc_id)),
             b AS (SELECT DISTINCT gh FROM e WHERE source = '$BenchmarkSource'),
             c AS (SELECT doc_id, n, count(*) AS n_leaked
                   FROM e JOIN b USING (gh)
                   WHERE source <> '$BenchmarkSource' GROUP BY 1, 2)
             SELECT doc_id, n AS n_grams, n_leaked,
                    CAST(n_leaked AS DOUBLE) / n AS contamination
             FROM c ORDER BY doc_id"""),
  )

  /** Integer-scaled idf: ln of a small-integer ratio, scaled to 1e6 and
    * floored to BIGINT in BOTH engines so downstream scores are exact
    * integer arithmetic.
    */
  private val IdfScale = 1000000.0

  private val TopKeywords = 3

  /** Per-document TF-IDF keyword extraction: top-3 terms per doc by
    * tf·idf_scaled (ties broken by term). The classic keyword/topic
    * signal for corpus curation dashboards and quality filters.
    */
  private val tfidfKeywords = DeclaredQuery(
    "tfidf_keywords",
    (s, d) => {
      val words = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
      // NO broadcast hint on dfT: it is vocabulary-cardinality (grows
      // with the corpus). AQE broadcasts it when it actually fits and
      // shuffles on term otherwise — tf is already shuffled by
      // (doc_id, term), so the fallback costs one extra exchange of a
      // narrow (term, df) table, never a driver OOM.
      val scored = tf
        .join(dfT, Seq("term"))
        .crossJoin(broadcast(nDocs)) // 1-row count scalar
        .withColumn(
          "idf_scaled",
          floor(lit(IdfScale) * log(col("n_docs").cast("double") / col("df")) + lit(0.5)),
        )
        .withColumn("score", col("tf") * col("idf_scaled"))
      scored
        .withColumn(
          "rk",
          row_number().over(
            Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))),
        )
        .filter(col("rk") <= TopKeywords)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rk").cast("long").as("rk"))
        .orderBy("doc_id", "rk")
    },
    Some(s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                        FROM documents),
             tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
             dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             n AS (SELECT count(*) AS n_docs FROM documents),
             s AS (SELECT doc_id, term, tf, df,
                          tf * CAST(floor($IdfScale * ln(CAST(n_docs AS DOUBLE) / df) + 0.5) AS BIGINT) AS score
                   FROM tf JOIN dft USING (term) CROSS JOIN n),
             r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                                ORDER BY score DESC, term) AS rk
                   FROM s)
             SELECT doc_id, term, tf, df, score, rk
             FROM r WHERE rk <= $TopKeywords ORDER BY doc_id, rk"""),
  )

  /** BM25 ranked search for a literal keyword query — the lexical
    * retrieval scorer beside [[tfidfKeywords]]'s per-doc extraction.
    * k1=1.2, b=0.75, idf = ln((N − df + ½)/(df + ½) + 1) (the
    * always-positive Lucene form).
    *
    * Cross-engine determinism: every per-(doc, term) contribution is a
    * chain of double ops over exactly-agreed integer inputs (tf, df,
    * len, N, Σlen), stated as the IDENTICAL expression text in both
    * engines — same parse, same IEEE op order, bit-equal result — then
    * scaled to BIGINT via `floor(x·1e9 + 0.5)`. Only those exact
    * integers cross the per-term aggregation, so the final ranking
    * cannot drift with partitioning or engine. (avgdl is the one
    * corpus-wide float: computed as one division of two exact BIGINTs,
    * not a distributed `avg`.)
    *
    * At 100 TB: the doc-length table is a narrow projection of the
    * corpus scan; tf touches only query-term postings (the `isin`
    * prunes at the scan); df/N/Σlen are tiny broadcast scalars; the
    * final ranking is a global top-k (`TakeOrderedAndProject`-shaped).
    */
  private val QueryTerms = Seq("scan", "filter", "join")
  private val BmTopK = 20

  private def bm25Contrib(nDocs: String, sumLen: String): String =
    s"CAST(floor(ln((CAST($nDocs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)" +
      s" * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / (CAST($sumLen AS DOUBLE) / $nDocs)))" +
      " * 1000000000.0 + 0.5) AS BIGINT)"

  /** The ranked BM25 top-k (doc_id, score, rank) — shared by the
    * declared `bm25_rank` and the `rrf_fusion` lexical arm, so the
    * scoring cannot drift between them.
    */
  private def bm25Ranked(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    // Substrate-pinned (optimization round 17): ten declared consumers
    // (bm25_rank, rrf_fusion, mmr_rerank, rm3_expansion, every offline
    // eval) re-derived this 20-row ranking — two corpus scans each, per
    // invocation. One definition, built once per session/dataset; the
    // k-row rank list is the signature-store pattern at its smallest.
    graft.SubstrateCache.substrate(s, d, "bm25-topk")(bm25RankedBuild(s, d))

  private def bm25RankedBuild(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val words = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = words
      .filter(col("term").isin(QueryTerms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val lens = documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("len").as("sum_len"))
    tf.join(broadcast(dfT), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats)) // 1-row corpus scalars
      .withColumn("contrib", expr(bm25Contrib("n_docs", "sum_len")))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"))
      // global top-k as sort+limit (TakeOrderedAndProject — never a
      // single-partition window over every matching doc); the rank
      // window then runs over k rows only
      .orderBy(col("score").desc, col("doc_id"))
      .limit(BmTopK)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))),
      )
      .select(col("doc_id"), col("score"), col("rank").cast("long").as("rank"))
  }

  private val bm25Rank = DeclaredQuery(
    "bm25_rank",
    (s, d) => bm25Ranked(s, d).orderBy("rank"),
    Some {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM w
                 WHERE term IN ($termList) GROUP BY 1, 2),
          dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          lens AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
          stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM lens),
          sc AS (SELECT doc_id,
                        ${bm25Contrib("n_docs", "sum_len")} AS contrib
                 FROM tf JOIN dft USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
          tot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM sc GROUP BY 1),
          r AS (SELECT doc_id, score,
                       row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM tot)
          SELECT doc_id, score, rank FROM r WHERE rank <= $BmTopK ORDER BY rank"""
    },
  )

  /** RRF constant (the standard k = 60 from the original paper) and the
    * fused output depth.
    */
  private val RrfK = 60
  private val RrfOut = 10

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (Cormack et al.: RRF outperforms either arm alone): fuse the
    * lexical BM25 top-k ([[bm25Ranked]], shared with `bm25_rank`) and a
    * dense cosine top-k (query vector 0 against the corpus) into one
    * ranking by Σ 1/(k + rank) over the lists each id appears in. The
    * reciprocal terms are EXACT integers (1 000 000 div (k + rank)) so
    * the fused ordering is engine-identical; absent ranks render as 0,
    * never NULL.
    *
    * At 100 TB each arm is already a global top-k
    * (TakeOrderedAndProject shapes); the fusion itself is a full-outer
    * join of two k-row lists — driver-trivial, AQE broadcasts. With
    * many queries the same plan partitions by query id and the window
    * ranks within each; nothing here grows with the corpus beyond the
    * arms' own scans.
    */
  private val rrfFusion = DeclaredQuery(
    "rrf_fusion",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val lex = bm25Ranked(s, d).select(col("doc_id"), col("rank").as("rank_lex"))
      val e = embeddings(s, d)
        .withColumn("dvec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      val q = e.filter(col("vec_id") === 0).select(col("dvec").as("qv"))
      val dense = e
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q)) // 1-row query vector
        .withColumn("sim", Disp.roundz(expr("cosine_similarity(qv, dvec)"), 6))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(BmTopK)
        .withColumn(
          "rank_dense",
          row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"),
        )
        .select(col("vec_id").as("doc_id"), col("rank_dense"))
      lex
        .join(dense, Seq("doc_id"), "full_outer")
        .withColumn(
          "rrf_score",
          coalesce(expr(s"1000000 div ($RrfK + rank_lex)"), lit(0L)) +
            coalesce(expr(s"1000000 div ($RrfK + rank_dense)"), lit(0L)),
        )
        .withColumn(
          "rank",
          row_number().over(Window.orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"),
        )
        .filter(col("rank") <= RrfOut)
        .select(
          col("rank"),
          col("doc_id"),
          col("rrf_score"),
          coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
          coalesce(col("rank_dense"), lit(0L)).as("rank_dense"),
        )
        .orderBy("rank")
    },
    Some {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM w
                 WHERE term IN ($termList) GROUP BY 1, 2),
          dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          lens AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
          stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM lens),
          sc AS (SELECT doc_id,
                        ${bm25Contrib("n_docs", "sum_len")} AS contrib
                 FROM tf JOIN dft USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
          tot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM sc GROUP BY 1),
          lr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex FROM tot),
          r1 AS (SELECT doc_id, rank_lex FROM lr WHERE rank_lex <= $BmTopK),
          e AS (SELECT vec_id, embedding::DOUBLE[] AS dvec,
                       sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
                FROM embeddings),
          qv AS (SELECT dvec AS qv, nrm AS qn FROM e WHERE vec_id = 0),
          ds AS (SELECT c.vec_id AS doc_id,
                        (round(list_inner_product(qv.qv, c.dvec) / (qv.qn * c.nrm), 6) + 0.0) AS sim
                 FROM e c, qv WHERE c.vec_id <> 0),
          dr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rank_dense FROM ds),
          r2 AS (SELECT doc_id, rank_dense FROM dr WHERE rank_dense <= $BmTopK),
          f AS (SELECT coalesce(r1.doc_id, r2.doc_id) AS doc_id,
                       coalesce(1000000 // ($RrfK + r1.rank_lex), 0)
                         + coalesce(1000000 // ($RrfK + r2.rank_dense), 0) AS rrf_score,
                       coalesce(r1.rank_lex, 0) AS rank_lex,
                       coalesce(r2.rank_dense, 0) AS rank_dense
                FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id),
          rk AS (SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank FROM f)
          SELECT CAST(rank AS BIGINT) AS rank, doc_id,
                 CAST(rrf_score AS BIGINT) AS rrf_score,
                 CAST(rank_lex AS BIGINT) AS rank_lex,
                 CAST(rank_dense AS BIGINT) AS rank_dense
          FROM rk WHERE rank <= $RrfOut ORDER BY rank"""
    },
  )

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001,
    * μ = 2000) — the language-model IR family beside [[bm25Rank]]'s
    * probabilistic one (the two standard lexical scorers a hybrid stack
    * A/B-tests): score(D) = Σ_{t∈Q} ln((tf_{t,D} + μ·p(t|C)) / (|D| + μ)),
    * with the collection model p(t|C) = ctf_t/|C| folded in as exact
    * integers (tf·|C| + μ·ctf over (len + μ)·|C| — no division inside
    * the ln argument's construction).
    *
    * Absent query terms contribute too (the LM difference from BM25's
    * matched-only sum): the per-doc fan-out is a LITERAL |Q|-element
    * explode over the doc-length projection (scan-local, |Q|·n narrow
    * rows), the sparse tf postings join is query-term-bounded
    * (un-hinted; AQE broadcasts postings of |Q| terms), ctf/|C| are
    * 3-row/1-row broadcast scalars. Each contribution is ×10⁶-floored
    * to BIGINT from one shared double-chain text, the per-doc sum is
    * exact, and the result is a TakeOrderedAndProject top-20.
    */
  private val QlmMu = 2000
  private val QlmTopK = 20

  private val qlmContrib =
    s"CAST(floor((ln(CAST(tf0 AS DOUBLE) * c_tok + $QlmMu.0 * ctf)" +
      s" - ln((len + $QlmMu.0) * CAST(c_tok AS DOUBLE)))" +
      " * 1000000.0 + 0.5) AS BIGINT)"

  /** The ranked QLM top-k — shared by the declared `dirichlet_qlm` and
    * the `ranker_agreement` comparison arm, so the measured ranking IS
    * the declared one.
    */
  private def qlmRanked(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    // Substrate-pinned (optimization round 17) — same rationale as
    // [[bm25Ranked]]: five declared consumers, one k-row frame.
    graft.SubstrateCache.substrate(s, d, "qlm-topk")(qlmRankedBuild(s, d))

  private def qlmRankedBuild(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val words = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(QueryTerms: _*))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val ctf = words.groupBy("term").agg(count(lit(1)).as("ctf"))
    val lens = documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
    val ctot = lens.agg(sum("len").as("c_tok"))
    lens
      .withColumn("term", explode(array(QueryTerms.map(lit): _*)))
      .join(tf, Seq("doc_id", "term"), "left") // postings of |Q| terms — AQE-sized
      .withColumn("tf0", coalesce(col("tf"), lit(0L)))
      .join(broadcast(ctf), Seq("term")) // |Q|-row collection frequencies
      .crossJoin(broadcast(ctot)) // 1-row |C|
      .withColumn("contrib", expr(qlmContrib))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(QlmTopK)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))),
      )
      .select(col("doc_id"), col("score"), col("rank").cast("long").as("rank"))
  }

  private val dirichletQlm = DeclaredQuery(
    "dirichlet_qlm",
    (s, d) => qlmRanked(s, d).orderBy("rank"),
    Some {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          wq AS (SELECT doc_id, term FROM w WHERE term IN ($termList)),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM wq GROUP BY 1, 2),
          ctft AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM wq GROUP BY 1),
          lens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
                   FROM documents),
          ctot AS (SELECT CAST(sum(len) AS BIGINT) AS c_tok FROM lens),
          grid AS (SELECT lens.doc_id, lens.len, qt.term
                   FROM lens CROSS JOIN (SELECT unnest([$termList]) AS term) qt),
          sc AS (SELECT g.doc_id,
                        coalesce(tf.tf, 0) AS tf0, c.ctf, g.len, t.c_tok
                 FROM grid g
                 LEFT JOIN tf ON g.doc_id = tf.doc_id AND g.term = tf.term
                 JOIN ctft c ON g.term = c.term
                 CROSS JOIN ctot t),
          cb AS (SELECT doc_id, $qlmContrib AS contrib FROM sc),
          tot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM cb GROUP BY 1),
          r AS (SELECT doc_id, score,
                       row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM tot)
          SELECT doc_id, score, rank FROM r WHERE rank <= $QlmTopK ORDER BY rank"""
    },
  )

  /** Ranker-agreement curve — the offline IR eval run before swapping
    * lexical scorers (or weighting a fusion): top-depth overlap between
    * the BM25 and Dirichlet-QLM rankings at depth ∈ {1, 3, 5, 10, 20}.
    * High agreement at shallow depth means the scorers are
    * interchangeable for head traffic; divergence localizes where a
    * fusion (`rrf_fusion`'s shape) actually buys diversity. Both arms
    * are the SHARED ranked helpers behind the declared queries
    * ([[bm25Ranked]], [[qlmRanked]]) — the measured rankers ARE the
    * deployed ones.
    *
    * Scale: each arm is already a k-row TakeOrderedAndProject; the
    * comparison is a k-row full-outer join crossed with a 5-row literal
    * depth grid (conditional sums — the threshold-sweep shape). Exact
    * integer overlap, ×10³ by truncating division.
    */
  private val AgreementDepths = Seq(1L, 3L, 5L, 10L, 20L)
  private val rankerAgreement = DeclaredQuery(
    "ranker_agreement",
    (s, d) => {
      import s.implicits._
      val lex = bm25Ranked(s, d).select(col("doc_id"), col("rank").as("rl"))
      val qr = qlmRanked(s, d).select(col("doc_id"), col("rank").as("rq"))
      val j = lex.join(qr, Seq("doc_id"), "full_outer")
      AgreementDepths
        .toDF("depth")
        .crossJoin(j)
        .groupBy("depth")
        .agg(
          sum(when(col("rl") <= col("depth") && col("rq") <= col("depth"), 1L).otherwise(0L))
            .as("n_common"),
        )
        .withColumn("overlap_e3", expr("n_common * 1000 DIV depth"))
        .orderBy("depth")
    },
    Some {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      val depthList = AgreementDepths.mkString(", ")
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM w
                 WHERE term IN ($termList) GROUP BY 1, 2),
          dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          lens AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
          stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM lens),
          sc AS (SELECT doc_id,
                        ${bm25Contrib("n_docs", "sum_len")} AS contrib
                 FROM tf JOIN dft USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
          tot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM sc GROUP BY 1),
          lr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rl FROM tot),
          qwq AS (SELECT doc_id, term FROM w WHERE term IN ($termList)),
          qtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM qwq GROUP BY 1, 2),
          qctf AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM qwq GROUP BY 1),
          qlens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
                    FROM documents),
          qctot AS (SELECT CAST(sum(len) AS BIGINT) AS c_tok FROM qlens),
          qgrid AS (SELECT qlens.doc_id, qlens.len, qt.term
                    FROM qlens CROSS JOIN (SELECT unnest([$termList]) AS term) qt),
          qsc AS (SELECT g.doc_id,
                         coalesce(qtf.tf, 0) AS tf0, c.ctf, g.len, t.c_tok
                  FROM qgrid g
                  LEFT JOIN qtf ON g.doc_id = qtf.doc_id AND g.term = qtf.term
                  JOIN qctf c ON g.term = c.term
                  CROSS JOIN qctot t),
          qcb AS (SELECT doc_id, $qlmContrib AS contrib FROM qsc),
          qtot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM qcb GROUP BY 1),
          qr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rq FROM qtot),
          j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, a.rl, b.rq
                FROM (SELECT doc_id, rl FROM lr WHERE rl <= $BmTopK) a
                FULL JOIN (SELECT doc_id, rq FROM qr WHERE rq <= $QlmTopK) b
                  ON a.doc_id = b.doc_id),
          g AS (SELECT unnest([$depthList]) AS depth)
          SELECT CAST(g.depth AS BIGINT) AS depth,
                 CAST(sum(CASE WHEN j.rl <= g.depth AND j.rq <= g.depth
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
                 (CAST(sum(CASE WHEN j.rl <= g.depth AND j.rq <= g.depth
                                THEN 1 ELSE 0 END) AS BIGINT) * 1000) // g.depth AS overlap_e3
          FROM g CROSS JOIN j GROUP BY g.depth ORDER BY 1"""
    },
  )

  /** MMR diversified reranking (Carbonell & Goldstein 1998, λ = 0.7) —
    * the standard redundancy-killer between retrieval and a context
    * window: greedily pick k results maximizing λ·relevance −
    * (1−λ)·max-similarity-to-already-selected, so near-duplicate hits
    * don't crowd out coverage. The flagship COMPOSITION query: the
    * relevance arm is the SHARED [[bm25Ranked]] top-20 (rank-linear
    * ×10⁶ integer relevance), the redundancy arm is pairwise embedding
    * cosine among those 20 candidates (doc_id ≡ vec_id, the
    * cluster_text_profile equivalence), ×10⁶-floored to exact BIGINTs,
    * and the MMR objective is the pure integer 7·rel − 3·maxsim (no
    * division — DIV/ // disagree on negatives).
    *
    * Scale: candidate generation is the distributed part (the bm25 arm
    * is a TakeOrderedAndProject; the pairwise-sim frame is k² = 380
    * rows). The greedy itself is O(k²) DRIVER arithmetic over those
    * bounded collects — exactly what a production reranker does with a
    * top-k page (the nprobe-rows / BPE-argmax bounded-collect
    * precedent). The oracle unrolls all five greedy steps as chained
    * CTEs — declarative vs iterative hash-matched.
    */
  private val MmrK = 5
  private val mmrRerank = DeclaredQuery(
    "mmr_rerank",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val cands = bm25Ranked(s, d)
        .select(col("doc_id"), col("rank"))
        .withColumn("rel_e6", (lit(BmTopK.toLong + 1L) - col("rank")) * lit(50000L))
      val emb = embeddings(s, d).select(
        col("vec_id").as("doc_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("dvec"),
      )
      val ce = cands.join(emb, Seq("doc_id"))
      val av = ce.select(col("doc_id").as("a"), col("dvec").as("qv"))
      val bv = ce.select(col("doc_id").as("b"), col("dvec").as("cv"))
      val simRows = av
        .crossJoin(bv)
        .filter(col("a") =!= col("b"))
        .select(
          col("a"),
          col("b"),
          expr("CAST(floor(cosine_similarity(qv, cv) * 1000000.0 + 0.5) AS BIGINT)").as("sim_e6"),
        )
        .collect() // k² = 380 rows — bounded by construction
      val sim = simRows.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      var remaining = cands
        .select("doc_id", "rel_e6")
        .collect() // k = 20 rows — bounded by construction
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
        .toVector
      var selected = Vector.empty[(Long, Long, Long, Long, Long)]
      for (step <- 1 to MmrK) {
        val scored = remaining.map { case (doc, rel) =>
          // max over EXISTING pairs only (docs outside the embedding
          // table contribute no redundancy edge) — a phantom 0 in the
          // max would mask an all-negative similarity profile, which
          // the oracle's coalesce(max(existing), 0) does not do; ms
          // falls back to 0 only when NO pair exists (sf2 caught this)
          val sims = selected.flatMap(sel => sim.get((doc, sel._2)))
          val ms = if (sims.isEmpty) 0L else sims.max
          (doc, rel, ms, 7L * rel - 3L * ms)
        }
        val best = scored.minBy { case (doc, _, _, mmr) => (-mmr, doc) }
        selected :+= ((step.toLong, best._1, best._2, best._3, best._4))
        remaining = remaining.filterNot(_._1 == best._1)
      }
      import s.implicits._
      selected.toDF("step", "doc_id", "rel_e6", "ms_e6", "mmr").orderBy("step")
    },
    Some {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      val steps = (2 to MmrK)
        .map { i =>
          s"""m$i AS (SELECT r.doc_id, r.rel_e6, coalesce(max(p.sim_e6), 0) AS ms
                      FROM cnd r LEFT JOIN p
                        ON p.a = r.doc_id AND p.b IN (SELECT doc_id FROM sel${i - 1})
                      WHERE r.doc_id NOT IN (SELECT doc_id FROM sel${i - 1})
                      GROUP BY 1, 2),
              pick$i AS (SELECT CAST($i AS BIGINT) AS step, doc_id, rel_e6, ms,
                                7 * rel_e6 - 3 * ms AS mmr
                         FROM m$i ORDER BY 7 * rel_e6 - 3 * ms DESC, doc_id LIMIT 1),
              sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM pick$i)"""
        }
        .mkString(",\n")
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM w
                 WHERE term IN ($termList) GROUP BY 1, 2),
          dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          lens AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
          stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM lens),
          sc AS (SELECT doc_id,
                        ${bm25Contrib("n_docs", "sum_len")} AS contrib
                 FROM tf JOIN dft USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
          tot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM sc GROUP BY 1),
          rr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM tot),
          cnd AS (SELECT doc_id, (${BmTopK + 1} - rank) * 50000 AS rel_e6
                  FROM rr WHERE rank <= $BmTopK),
          ee AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS dvec,
                        sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
                 FROM embeddings),
          p AS (SELECT x.doc_id AS a, y.doc_id AS b,
                       CAST(floor(list_inner_product(ex.dvec, ey.dvec) / (ex.nrm * ey.nrm)
                                  * 1000000.0 + 0.5) AS BIGINT) AS sim_e6
                FROM cnd x
                JOIN ee ex ON ex.doc_id = x.doc_id
                JOIN cnd y ON x.doc_id <> y.doc_id
                JOIN ee ey ON ey.doc_id = y.doc_id),
          m1 AS (SELECT doc_id, rel_e6, CAST(0 AS BIGINT) AS ms FROM cnd),
          pick1 AS (SELECT CAST(1 AS BIGINT) AS step, doc_id, rel_e6, ms,
                           7 * rel_e6 - 3 * ms AS mmr
                    FROM m1 ORDER BY 7 * rel_e6 - 3 * ms DESC, doc_id LIMIT 1),
          sel1 AS (SELECT * FROM pick1),
          $steps
          SELECT step, doc_id, CAST(rel_e6 AS BIGINT) AS rel_e6,
                 CAST(ms AS BIGINT) AS ms_e6, CAST(mmr AS BIGINT) AS mmr
          FROM sel$MmrK ORDER BY step"""
    },
  )

  private val FbDocs = 10
  private val ExpTerms = 5
  private val Rm3Out = 10
  private val Rm3OrigWeight = 1000L

  /** RM3-style pseudo-relevance feedback — the standard query-expansion
    * recipe (Lavrenko & Croft relevance models, the RM3 interpolation
    * every Anserini/Indri baseline ships): retrieve a first-pass BM25
    * top-[[FbDocs]], estimate a feedback term distribution from those
    * docs (Σ_d tf/|d|, the uniform-weight RM1), keep the top-
    * [[ExpTerms]] non-query terms, and rescore the corpus with original
    * terms at full weight plus expansion terms weighted by their ‰
    * share of the feedback mass. Output: the reranked top-[[Rm3Out]]
    * with both scores and the first-pass rank (0 = newly surfaced) —
    * the side-by-side a retrieval engineer reads to judge expansion
    * drift.
    *
    * Exactness: both passes ride the SHARED [[bm25Contrib]] text (the
    * e9-scaled floored contribution — ln() is bit-identical across
    * engines on identical inputs); the feedback weights are truncating
    * integer divisions (tf·10⁹ DIV len, non-negative) and the ‰
    * interpolation is one more integral division — every score an
    * exact BIGINT, full-key tiebreaks everywhere.
    *
    * Scale: pass 1 is `bm25_rank`'s plan (term-filtered scan +
    * TakeOrderedAndProject). The feedback model reads [[FbDocs]] docs
    * (broadcast id list, semi-join). Pass 2 is another term-filtered
    * scan — the expanded term list is a ≤ 8-row broadcast, so the
    * corpus-sized work is two scans and two global top-ks; nothing
    * grows with the corpus beyond them.
    */
  private val rm3Expansion = DeclaredQuery(
    "rm3_expansion",
    (s, d) => {
      val base = bm25Ranked(s, d)
      val fbIds = base.filter(col("rank") <= FbDocs).select("doc_id")
      val words = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val lens = documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      // feedback model: per-term mass Σ_d (tf·1e9 DIV len) over the
      // feedback docs; query terms and sub-4-char tokens excluded
      val fbw = words
        .join(broadcast(fbIds), Seq("doc_id"), "left_semi")
        .filter(!col("term").isin(QueryTerms: _*) && length(col("term")) >= 4)
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
        .join(lens, Seq("doc_id"))
        .withColumn("wpart", expr("tf * 1000000000 DIV len"))
        .groupBy("term")
        .agg(sum(col("wpart")).as("w_e9"))
        .orderBy(col("w_e9").desc, col("term"))
        .limit(ExpTerms)
      val fbTotal = fbw.agg(sum(col("w_e9")).as("w_tot"))
      val expTerms = fbw
        .crossJoin(broadcast(fbTotal))
        .withColumn("tweight", expr("(w_e9 * 1000) DIV w_tot"))
        .select(col("term"), col("tweight"))
      val allTerms = expTerms.unionByName(
        QueryTerms.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) { (acc, t) =>
          val one = s.range(1).select(lit(t).as("term"), lit(Rm3OrigWeight).as("tweight"))
          Some(acc.fold(one)(_ unionByName one))
        }.get,
      )
      val tf2 = words
        .join(broadcast(allTerms), Seq("term"))
        .groupBy("doc_id", "term", "tweight")
        .agg(count(lit(1)).as("tf"))
      val dfT2 = tf2.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = lens.agg(count(lit(1)).as("n_docs"), sum("len").as("sum_len"))
      val rescored = tf2
        .join(broadcast(dfT2), Seq("term"))
        .join(lens, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("contrib", expr(bm25Contrib("n_docs", "sum_len")))
        .withColumn("wc", expr("contrib * tweight"))
        .groupBy("doc_id")
        .agg(sum(col("wc")).as("score_rm3"))
        .orderBy(col("score_rm3").desc, col("doc_id"))
        .limit(Rm3Out)
        .withColumn(
          "rank_rm3",
          row_number().over(Window.orderBy(col("score_rm3").desc, col("doc_id"))).cast("long"),
        )
      rescored
        .join(base.select(col("doc_id"), col("rank").as("base_rank")), Seq("doc_id"), "left")
        .withColumn("base_rank", coalesce(col("base_rank"), lit(0L)))
        .select("doc_id", "score_rm3", "rank_rm3", "base_rank")
        .orderBy("rank_rm3")
    },
    Some {
      val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
      val origRows = QueryTerms.map(t => s"('$t', $Rm3OrigWeight)").mkString(", ")
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM w
                 WHERE term IN ($termList) GROUP BY 1, 2),
          dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          lens AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
          stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM lens),
          sc AS (SELECT doc_id,
                        ${bm25Contrib("n_docs", "sum_len")} AS contrib
                 FROM tf JOIN dft USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
          tot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM sc GROUP BY 1),
          r AS (SELECT doc_id, score,
                       row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM tot),
          fb AS (SELECT doc_id FROM r WHERE rank <= $FbDocs),
          fwp AS (SELECT wd.term, wd.doc_id, count(*) AS tf
                  FROM w wd JOIN fb USING (doc_id)
                  WHERE wd.term NOT IN ($termList) AND length(wd.term) >= 4
                  GROUP BY 1, 2),
          fbw AS (SELECT term, CAST(sum((tf * 1000000000) // len) AS BIGINT) AS w_e9
                  FROM fwp JOIN lens USING (doc_id)
                  GROUP BY 1 ORDER BY w_e9 DESC, term LIMIT $ExpTerms),
          ftot AS (SELECT CAST(sum(w_e9) AS BIGINT) AS w_tot FROM fbw),
          expt AS (SELECT term, (w_e9 * 1000) // w_tot AS tweight FROM fbw CROSS JOIN ftot
                   UNION ALL SELECT * FROM (VALUES $origRows) v(term, tweight)),
          tf2 AS (SELECT wd.doc_id, wd.term, e.tweight, count(*) AS tf
                  FROM w wd JOIN expt e ON wd.term = e.term
                  GROUP BY 1, 2, 3),
          dft2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY 1),
          sc2 AS (SELECT doc_id,
                         ${bm25Contrib("n_docs", "sum_len")} * tweight AS wc
                  FROM tf2 JOIN dft2 USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
          tot2 AS (SELECT doc_id, CAST(sum(wc) AS BIGINT) AS score_rm3 FROM sc2 GROUP BY 1),
          r2 AS (SELECT doc_id, score_rm3,
                        CAST(row_number() OVER (ORDER BY score_rm3 DESC, doc_id) AS BIGINT)
                          AS rank_rm3
                 FROM tot2),
          rb AS (SELECT doc_id, rank FROM r WHERE rank <= $BmTopK)
          SELECT r2.doc_id, r2.score_rm3, r2.rank_rm3,
                 CAST(coalesce(rb.rank, 0) AS BIGINT) AS base_rank
          FROM r2 LEFT JOIN rb ON r2.doc_id = rb.doc_id
          WHERE r2.rank_rm3 <= $Rm3Out ORDER BY r2.rank_rm3"""
    },
  )

  private val RocFbK = 10
  private val RocOut = 10

  /** Rocchio dense feedback — the embedding-space sibling of
    * [[rm3Expansion]] (Rocchio 1971, the prototype-vector update every
    * IR course teaches and dense retrievers still use as PRF): take the
    * query vector's exact-int-dot top-[[RocFbK]], average their
    * quantized embeddings into a feedback centroid, move the query
    * 0.7·q + 0.3·centroid, and rescore the corpus with the moved
    * vector. Output: the reranked top-[[RocOut]] with both scores and
    * the first-pass rank (0 = surfaced by feedback) — read beside
    * `rm3_expansion`, the lexical and dense PRF arms of one hybrid
    * stack.
    *
    * Exactness: embeddings quantize to ×10⁶ BIGINTs (the
    * embedding_covariance discipline); both passes are exact BIGINT
    * dots (native graft_int_dot kernel / the SQ8 list_reduce text);
    * the centroid is a truncating per-component DIV (both engines
    * truncate toward zero on integers) and the 0.7/0.3 mix is the
    * integer 700·q + 300·c — every ordering key an exact integer,
    * full-key tiebreaks.
    *
    * Scale: pass 1 is one corpus scan + TakeOrderedAndProject (the
    * query is ONE broadcast row). The centroid is a [[RocFbK]]-doc,
    * dimension-cardinality agg collected driver-side (65 bounded rows —
    * the k-row Lloyd-partials class), so pass 2 is a ZERO-join scan:
    * the moved vector rides into the kernel as a literal, and the only
    * exchange left is the top-k merge.
    */
  private val rocchioRerank = DeclaredQuery(
    "rocchio_rerank",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val qz = embeddings(s, d).select(
        col("vec_id"),
        expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))")
          .as("qv"),
      )
      val qRow = qz.filter(col("vec_id") === 0L).select(col("qv").as("qqv"))
      val base = qz
        .filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(qRow))
        .withColumn("qdot", expr("graft_int_dot(qqv, qv)"))
        .orderBy(col("qdot").desc, col("vec_id"))
        .limit(RocFbK)
        .withColumn(
          "base_rank",
          row_number().over(Window.orderBy(col("qdot").desc, col("vec_id"))).cast("long"),
        )
        .select(col("vec_id"), col("base_rank"))
      // bounded driver work: RocFbK docs × Dim components + the query row
      val fbSums = qz
        .join(base.select("vec_id"), Seq("vec_id"), "left_semi")
        .select(posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("pos")
        .agg(sum(col("v")).as("sv"))
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1))
        .toMap
      val qVec = qz
        .filter(col("vec_id") === 0L)
        .select(col("qv"))
        .collect()(0)
        .getSeq[Long](0)
      val moved: Seq[Long] = qVec.indices.map { k =>
        700L * qVec(k) + 300L * (fbSums.getOrElse(k, 0L) / RocFbK)
      }
      val rescored = qz
        .filter(col("vec_id") =!= 0L)
        .withColumn(
          "score_roc",
          call_function("graft_int_dot", col("qv"), typedlit(moved)),
        )
        .orderBy(col("score_roc").desc, col("vec_id"))
        .limit(RocOut)
        .withColumn(
          "rank_roc",
          row_number().over(Window.orderBy(col("score_roc").desc, col("vec_id"))).cast("long"),
        )
      rescored
        .join(base, Seq("vec_id"), "left")
        .withColumn("base_rank", coalesce(col("base_rank"), lit(0L)))
        .select(col("vec_id"), col("score_roc"), col("rank_roc"), col("base_rank"))
        .orderBy("rank_roc")
    },
    Some(s"""WITH qz AS (SELECT vec_id,
                                list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qv
                         FROM embeddings),
             qrow AS (SELECT qv AS qqv FROM qz WHERE vec_id = 0),
             p AS (SELECT c.vec_id,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(range(1, len(q.qqv) + 1), i -> q.qqv[i] * c.qv[i])),
                            (s2, x) -> s2 + x) AS qdot
                   FROM qz c CROSS JOIN qrow q WHERE c.vec_id <> 0),
             base AS (SELECT vec_id,
                             CAST(row_number() OVER (ORDER BY qdot DESC, vec_id) AS BIGINT)
                               AS base_rank
                      FROM p ORDER BY qdot DESC, vec_id LIMIT $RocFbK),
             fbx AS (SELECT generate_subscripts(qv, 1) - 1 AS pos, unnest(qv) AS v
                     FROM qz JOIN base USING (vec_id)),
             ctr AS (SELECT list(sv ORDER BY pos) AS cv
                     FROM (SELECT pos, CAST(sum(v) AS BIGINT) // $RocFbK AS sv
                           FROM fbx GROUP BY pos)),
             mv AS (SELECT list_transform(range(1, len(q.qqv) + 1),
                             i -> 700 * q.qqv[i] + 300 * c.cv[i]) AS rv
                    FROM qrow q CROSS JOIN ctr c),
             sc AS (SELECT c.vec_id,
                           list_reduce(list_prepend(CAST(0 AS BIGINT),
                             list_transform(range(1, len(m.rv) + 1), i -> m.rv[i] * c.qv[i])),
                             (s2, x) -> s2 + x) AS score_roc
                    FROM qz c CROSS JOIN mv m WHERE c.vec_id <> 0),
             r2 AS (SELECT vec_id, score_roc,
                           CAST(row_number() OVER (ORDER BY score_roc DESC, vec_id) AS BIGINT)
                             AS rank_roc
                    FROM sc)
             SELECT r2.vec_id, r2.score_roc, r2.rank_roc,
                    CAST(coalesce(b.base_rank, 0) AS BIGINT) AS base_rank
             FROM r2 LEFT JOIN base b ON r2.vec_id = b.vec_id
             WHERE r2.rank_roc <= $RocOut ORDER BY r2.rank_roc"""),
  )

  /** NDCG@{5,10,20} offline evaluation of both deployed lexical rankers
    * (Järvelin & Kekäläinen 2002) — the graded-relevance metric that
    * `ranker_agreement`'s set-overlap curve cannot express: it rewards
    * putting HIGHLY relevant documents EARLY, which is what an RAG
    * context window or a pretraining-data retrieval filter actually
    * consumes. Relevance judgments are derived from the DENSE arm (the
    * doc_id ≡ vec_id equivalence `mmr_rerank` / `cluster_text_profile`
    * established): exact ×10⁶-int query dot (vec_id 0 as the query, the
    * `rocchio_rerank` convention), top-[[NdcgPool]] judged pool, grades
    * 3/2/1 at dense rank ≤ 4 / ≤ 12 / ≤ [[NdcgPool]] — so the metric
    * measures how well each LEXICAL ranker recovers the dense ordering,
    * the cross-encoder-as-judge shape of production IR evals.
    *
    * Exactness: each DCG term is the IDENTICAL double chain in both
    * engines — gain/(ln(rank+1)/ln 2) with gain = 2^rel − 1 ∈ {7,3,1}
    * stated as integer CASE arms — ×10⁶-floored to BIGINT, so the sums
    * are exact; ndcg_e3 is a truncating integer DIV. Because the grade
    * is non-increasing in dense rank, the ideal ordering IS the judged
    * pool's own order, so IDCG sums the same term over the pool — no
    * second sort, and ties cannot reorder gains.
    *
    * Scale: both ranker arms are the SHARED top-k helpers (each one
    * corpus scan ending in TakeOrderedAndProject); the judged pool is
    * one dense scan ending in the same top-k shape (the query is ONE
    * broadcast row, never a pairwise join); everything downstream is a
    * ≤ 36-row frame crossed with a 3-row literal depth grid. Adding
    * rankers or depths never rescans the corpus.
    */
  private val NdcgPool = 36
  private val NdcgDepths = Seq(5L, 10L, 20L)

  /** One DCG term: gain / log2(rank+1), ×10⁶-floored. Shared expression
    * text — same parse, same IEEE op order, bit-equal in both engines.
    */
  private def ndcgTerm(rank: String, gain: String): String =
    s"CAST(floor(CAST($gain AS DOUBLE) / (ln(CAST($rank AS DOUBLE) + 1.0) / ln(2.0))" +
      " * 1000000.0 + 0.5) AS BIGINT)"

  /** The shared DuckDB statement of [[judgedPool]] + [[evalArms]] — a
    * CTE chain ending in `judged(doc_id, r, gain)` and
    * `arms(ranker, doc_id, rank)`, interpolated into every offline-eval
    * oracle so the judged pool and the measured arms have exactly one
    * SQL definition.
    */
  private lazy val evalArmsDuckCtes: String = {
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""qz AS (SELECT vec_id,
                             list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qv
                      FROM embeddings),
          qrow AS (SELECT qv AS qqv FROM qz WHERE vec_id = 0),
          p AS (SELECT c.vec_id,
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(range(1, len(q.qqv) + 1), i -> q.qqv[i] * c.qv[i])),
                         (s2, x) -> s2 + x) AS qdot
                FROM qz c CROSS JOIN qrow q WHERE c.vec_id <> 0),
          pool AS (SELECT vec_id AS doc_id,
                          CAST(row_number() OVER (ORDER BY qdot DESC, vec_id) AS BIGINT) AS r
                   FROM p ORDER BY qdot DESC, vec_id LIMIT $NdcgPool),
          judged AS MATERIALIZED (SELECT doc_id, r,
                            CASE WHEN r <= 4 THEN 7 WHEN r <= 12 THEN 3 ELSE 1 END AS gain
                     FROM pool),
          w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM w
                 WHERE term IN ($termList) GROUP BY 1, 2),
          dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          lens AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
          stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM lens),
          bsc AS (SELECT doc_id,
                         ${bm25Contrib("n_docs", "sum_len")} AS contrib
                  FROM tf JOIN dft USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
          btot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM bsc GROUP BY 1),
          br AS (SELECT doc_id,
                        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
                 FROM btot),
          qwq AS (SELECT doc_id, term FROM w WHERE term IN ($termList)),
          qtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM qwq GROUP BY 1, 2),
          qctf AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM qwq GROUP BY 1),
          qlens AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
                    FROM documents),
          qctot AS (SELECT CAST(sum(len) AS BIGINT) AS c_tok FROM qlens),
          qgrid AS (SELECT qlens.doc_id, qlens.len, qt.term
                    FROM qlens CROSS JOIN (SELECT unnest([$termList]) AS term) qt),
          qsc AS (SELECT g.doc_id,
                         coalesce(qtf.tf, 0) AS tf0, c.ctf, g.len, t.c_tok
                  FROM qgrid g
                  LEFT JOIN qtf ON g.doc_id = qtf.doc_id AND g.term = qtf.term
                  JOIN qctf c ON g.term = c.term
                  CROSS JOIN qctot t),
          qcb AS (SELECT doc_id, $qlmContrib AS contrib FROM qsc),
          qtot AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score FROM qcb GROUP BY 1),
          qr2 AS (SELECT doc_id,
                         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
                  FROM qtot),
          arms AS MATERIALIZED (SELECT 'bm25' AS ranker, doc_id, rank FROM br WHERE rank <= $BmTopK
                   UNION ALL
                   SELECT 'qlm' AS ranker, doc_id, rank FROM qr2 WHERE rank <= $QlmTopK)"""
  }

  /** The dense-judged pool (doc_id, r, gain) — dense top-[[NdcgPool]]
    * graded 3/2/1 by dense rank; SINGLE definition consumed by every
    * offline IR eval (`ndcg_eval`, `map_eval`, `mrr_eval`), so the
    * relevance judgments cannot drift between metrics.
    */
  private def judgedPool(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    // Substrate-pinned (optimization round 17): the 36-row judged pool is
    // read by all three offline eval metrics (ndcg/map/mrr).
    graft.SubstrateCache.substrate(s, d, "judged-pool")(judgedPoolBuild(s, d))

  private def judgedPoolBuild(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val qz = embeddings(s, d).select(
      col("vec_id"),
      expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))")
        .as("qv"),
    )
    val qRow = qz.filter(col("vec_id") === 0L).select(col("qv").as("qqv"))
    // the judged pool: dense top-36 (one scan, TakeOrderedAndProject),
    // graded 3/2/1 by dense rank — a bounded 36-row frame from here on
    qz.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qRow))
      .withColumn("qdot", expr("graft_int_dot(qqv, qv)"))
      .orderBy(col("qdot").desc, col("vec_id"))
      .limit(NdcgPool)
      .withColumn(
        "r",
        row_number().over(Window.orderBy(col("qdot").desc, col("vec_id"))).cast("long"),
      )
      .withColumn(
        "gain",
        when(col("r") <= 4L, 7L).when(col("r") <= 12L, 3L).otherwise(1L),
      )
      .select(col("vec_id").as("doc_id"), col("r"), col("gain"))
  }

  /** Both deployed lexical arms as one (ranker, doc_id, rank) frame —
    * the measured side of every offline eval, off the SHARED top-k
    * helpers so the measured rankings are the declared ones.
    */
  private def evalArms(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    bm25Ranked(s, d)
      .select(lit("bm25").as("ranker"), col("doc_id"), col("rank"))
      .unionByName(qlmRanked(s, d).select(lit("qlm").as("ranker"), col("doc_id"), col("rank")))

  private val ndcgEval = DeclaredQuery(
    "ndcg_eval",
    (s, d) => {
      import s.implicits._
      val judged = judgedPool(s, d)
      val depths = NdcgDepths.toDF("depth")
      def dcgOf(arm: org.apache.spark.sql.DataFrame, name: String) = arm
        .join(judged.select("doc_id", "gain"), Seq("doc_id"), "left")
        .withColumn("gain0", coalesce(col("gain"), lit(0L)))
        .withColumn("term", expr(ndcgTerm("rank", "gain0")))
        .crossJoin(broadcast(depths))
        .filter(col("rank") <= col("depth"))
        .groupBy("depth")
        .agg(sum("term").as("dcg_e6"))
        .withColumn("ranker", lit(name))
      val dcg = dcgOf(bm25Ranked(s, d), "bm25")
        .unionByName(dcgOf(qlmRanked(s, d), "qlm"))
      // grade non-increasing in dense rank ⇒ ideal order = pool order
      val idcg = judged
        .withColumn("term", expr(ndcgTerm("r", "gain")))
        .crossJoin(broadcast(depths))
        .filter(col("r") <= col("depth"))
        .groupBy("depth")
        .agg(sum("term").as("idcg_e6"))
      dcg
        .join(idcg, Seq("depth"))
        .withColumn("ndcg_e3", expr("dcg_e6 * 1000 DIV nullif(idcg_e6, 0)"))
        .select(col("ranker"), col("depth"), col("dcg_e6"), col("idcg_e6"), col("ndcg_e3"))
        .orderBy("ranker", "depth")
    },
    Some {
      val depthList = NdcgDepths.mkString(", ")
      s"""WITH $evalArmsDuckCtes,
          terms AS (SELECT a.ranker, a.rank,
                           ${ndcgTerm("a.rank", "coalesce(j.gain, 0)")} AS term
                    FROM arms a LEFT JOIN judged j ON a.doc_id = j.doc_id),
          g AS (SELECT CAST(unnest([$depthList]) AS BIGINT) AS depth),
          dcg AS (SELECT t.ranker, g.depth, CAST(sum(t.term) AS BIGINT) AS dcg_e6
                  FROM terms t CROSS JOIN g WHERE t.rank <= g.depth
                  GROUP BY t.ranker, g.depth),
          idcg AS (SELECT g.depth,
                          CAST(sum(${ndcgTerm("j.r", "j.gain")}) AS BIGINT) AS idcg_e6
                   FROM judged j CROSS JOIN g WHERE j.r <= g.depth
                   GROUP BY g.depth)
          SELECT d.ranker, d.depth, d.dcg_e6, i.idcg_e6,
                 d.dcg_e6 * 1000 // nullif(i.idcg_e6, 0) AS ndcg_e3
          FROM dcg d JOIN idcg i USING (depth)
          ORDER BY d.ranker, d.depth"""
    },
  )

  /** Mean-average-precision at {5,10,20} for both lexical arms — the
    * binary-relevance companion to `ndcg_eval` (AP is the area under
    * the precision-recall curve; nDCG grades position, AP grades
    * EVERY relevant hit's precision context, the TREC headline
    * number). Relevance binarizes the shared judged pool at gain ≥ 3
    * (dense rank ≤ 12 — the "highly relevant" tier), so all three
    * eval metrics read the same judgments.
    *
    * Exactness: each precision@i term is (hits@i·10⁶) DIV i — exact
    * nonneg integers (truncation ≡ floor), summed, then ONE DIV by
    * min(depth, R) (the trec_eval AP@k normalizer). The running
    * hits@i window is PARTITIONED by ranker over ≤ top-k rows.
    *
    * Scale: the arms and pool are the shared top-k helpers (corpus
    * scans ending in TakeOrderedAndProject); everything here is a
    * ≤ 40-row frame crossed with a 3-row depth grid.
    */
  private val mapEval = DeclaredQuery(
    "map_eval",
    (s, d) => {
      import s.implicits._
      val rel = judgedPool(s, d).filter(col("gain") >= 3L).select("doc_id")
      val nRel = rel.agg(count(lit(1)).as("n_rel"))
      val wr = Window.partitionBy("ranker").orderBy("rank")
      val depths = NdcgDepths.toDF("depth")
      evalArms(s, d)
        .join(rel.withColumn("one", lit(1L)), Seq("doc_id"), "left")
        .withColumn("isrel", coalesce(col("one"), lit(0L)))
        .withColumn("hits_at", sum("isrel").over(wr))
        .withColumn(
          "p_e6",
          expr("CASE WHEN isrel = 1 THEN (hits_at * 1000000) DIV rank ELSE CAST(0 AS BIGINT) END"),
        )
        .crossJoin(broadcast(depths))
        .filter(col("rank") <= col("depth"))
        .groupBy("ranker", "depth")
        .agg(sum("isrel").as("hits"), sum("p_e6").as("sum_p_e6"))
        .crossJoin(broadcast(nRel))
        .withColumn("ap_e6", expr("sum_p_e6 DIV least(depth, n_rel)"))
        .select("ranker", "depth", "hits", "ap_e6")
        .orderBy("ranker", "depth")
    },
    Some {
      val depthList = NdcgDepths.mkString(", ")
      s"""WITH $evalArmsDuckCtes,
          rel AS (SELECT doc_id FROM judged WHERE gain >= 3),
          nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rel FROM rel),
          h AS (SELECT a.ranker, a.rank,
                       CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS isrel
                FROM arms a LEFT JOIN rel r ON a.doc_id = r.doc_id),
          pr AS (SELECT ranker, rank, isrel,
                        CAST(sum(isrel) OVER (PARTITION BY ranker ORDER BY rank) AS BIGINT) AS hits_at
                 FROM h),
          tm AS (SELECT ranker, rank, isrel,
                        CASE WHEN isrel = 1 THEN (hits_at * 1000000) // rank ELSE 0 END AS p_e6
                 FROM pr),
          g AS (SELECT CAST(unnest([$depthList]) AS BIGINT) AS depth),
          ap AS (SELECT t.ranker, g.depth, CAST(sum(t.isrel) AS BIGINT) AS hits,
                        CAST(sum(t.p_e6) AS BIGINT) AS sum_p_e6
                 FROM tm t CROSS JOIN g WHERE t.rank <= g.depth GROUP BY 1, 2)
          SELECT ranker, depth, hits,
                 sum_p_e6 // least(depth, (SELECT n_rel FROM nr)) AS ap_e6
          FROM ap ORDER BY ranker, depth"""
    },
  )

  /** Mean reciprocal rank of both lexical arms against the shared
    * judged pool (gain ≥ 3 tier) — the first-relevant-hit latency
    * metric a RAG stack watches when only the top slot matters. The
    * reciprocal is exact: rr_e6 = 10⁶ DIV first_rel_rank (0 when the
    * arm's top-k misses every relevant doc — reported as rank 0, the
    * "missed" sentinel, rather than dropping the row). Bounded frames
    * end-to-end after the shared top-k scans.
    */
  private val mrrEval = DeclaredQuery(
    "mrr_eval",
    (s, d) => {
      import s.implicits._
      val rel = judgedPool(s, d).filter(col("gain") >= 3L).select("doc_id")
      val fr = evalArms(s, d)
        .join(rel, Seq("doc_id"))
        .groupBy("ranker")
        .agg(min("rank").as("frr"))
      Seq("bm25", "qlm")
        .toDF("ranker")
        .join(fr, Seq("ranker"), "left")
        .withColumn("first_rel_rank", coalesce(col("frr"), lit(0L)))
        .withColumn(
          "rr_e6",
          expr("CASE WHEN frr IS NULL THEN CAST(0 AS BIGINT) ELSE 1000000 DIV frr END"),
        )
        .select("ranker", "first_rel_rank", "rr_e6")
        .orderBy("ranker")
    },
    Some(s"""WITH $evalArmsDuckCtes,
             rel AS (SELECT doc_id FROM judged WHERE gain >= 3),
             fr AS (SELECT a.ranker, CAST(min(a.rank) AS BIGINT) AS frr
                    FROM arms a JOIN rel r ON a.doc_id = r.doc_id GROUP BY 1),
             rk AS (SELECT unnest(['bm25', 'qlm']) AS ranker)
             SELECT rk.ranker,
                    CAST(coalesce(fr.frr, 0) AS BIGINT) AS first_rel_rank,
                    CAST(CASE WHEN fr.frr IS NULL THEN 0 ELSE 1000000 // fr.frr END AS BIGINT) AS rr_e6
             FROM rk LEFT JOIN fr USING (ranker) ORDER BY rk.ranker"""),
  )

  /** Kendall τ-b rank correlation between the two lexical arms — the
    * ORDER-sensitive companion to `ranker_agreement`'s set-overlap
    * curve: two rankers can share every document yet order them
    * oppositely (overlap 1.0, τ −1), which is exactly what decides
    * whether fusing them (`rrf_fusion`) adds signal or noise. Computed
    * over the union of both top-k lists with the beyond-k sentinel rank
    * k+1 (absent-from-a-list is "tied below the horizon" — the standard
    * truncated-list convention, and the source of the tie correction
    * τ-b exists for).
    *
    * Exactness: concordant/discordant/tie counts are exact integers
    * over the ≤ C(2k,2) bounded pair frame; τ-b's sqrt denominator is
    * the one float, stated as the IDENTICAL expression text in both
    * engines from exact inputs, ×10³-floored; NULL when either arm is
    * fully tied (den 0).
    *
    * Scale: the arms are the shared corpus top-k scans; the pair frame
    * is ≤ 40×40 rows — driver-scale math kept declarative.
    */
  private val kendallTau = DeclaredQuery(
    "kendall_tau",
    (s, d) => {
      val beyond = BmTopK.toLong + 1L
      val lex = bm25Ranked(s, d).select(col("doc_id"), col("rank").as("rl"))
      val qr = qlmRanked(s, d).select(col("doc_id"), col("rank").as("rq"))
      val u = lex
        .join(qr, Seq("doc_id"), "full_outer")
        .select(
          col("doc_id"),
          coalesce(col("rl"), lit(beyond)).as("x"),
          coalesce(col("rq"), lit(beyond)).as("y"),
        )
      val a = u.select(col("doc_id").as("ida"), col("x").as("xa"), col("y").as("ya"))
      val b = u.select(col("doc_id").as("idb"), col("x").as("xb"), col("y").as("yb"))
      a.crossJoin(b)
        .filter(col("ida") < col("idb"))
        .agg(
          count(lit(1)).as("t0"),
          sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) > 0L, 1L).otherwise(0L))
            .as("n_c"),
          sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) < 0L, 1L).otherwise(0L))
            .as("n_d"),
          sum(when(col("xa") === col("xb"), 1L).otherwise(0L)).as("tx"),
          sum(when(col("ya") === col("yb"), 1L).otherwise(0L)).as("ty"),
        )
        .withColumn(
          "tau_e3",
          expr("""CASE WHEN t0 - tx = 0 OR t0 - ty = 0 THEN NULL ELSE
                  CAST(floor(CAST(n_c - n_d AS DOUBLE)
                    / sqrt(CAST(t0 - tx AS DOUBLE) * CAST(t0 - ty AS DOUBLE))
                    * 1000.0 + 0.5) AS BIGINT) END"""),
        )
        .orderBy("t0")
    },
    Some(s"""WITH $evalArmsDuckCtes,
             lexq AS (SELECT doc_id, rank FROM br WHERE rank <= $BmTopK),
             qlmq AS (SELECT doc_id, rank FROM qr2 WHERE rank <= $QlmTopK),
             uq AS MATERIALIZED (SELECT coalesce(l.doc_id, q.doc_id) AS doc_id,
                          CAST(coalesce(l.rank, ${BmTopK + 1}) AS BIGINT) AS x,
                          CAST(coalesce(q.rank, ${BmTopK + 1}) AS BIGINT) AS y
                   FROM lexq l FULL OUTER JOIN qlmq q ON l.doc_id = q.doc_id),
             g AS (SELECT CAST(count(*) AS BIGINT) AS t0,
                          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                          CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
                          CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                          CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
                   FROM uq a JOIN uq b ON a.doc_id < b.doc_id)
             SELECT t0, n_c, n_d, tx, ty,
                    CASE WHEN t0 - tx = 0 OR t0 - ty = 0 THEN NULL ELSE
                    CAST(floor(CAST(n_c - n_d AS DOUBLE)
                      / sqrt(CAST(t0 - tx AS DOUBLE) * CAST(t0 - ty AS DOUBLE))
                      * 1000.0 + 0.5) AS BIGINT) END AS tau_e3
             FROM g ORDER BY t0"""),
  )

  /** Spearman ρ between the two lexical arms over the same
    * union-of-top-k frame as `kendall_tau` (beyond-k docs take the
    * MIDRANK of the sentinel tie group, doubled to stay integral) —
    * the magnitude-of-displacement view where τ counts inversions.
    *
    * Exactness — fully exact, no float at all: both arms emit a
    * complete top-k over the same union, so the two midrank columns
    * share one value MULTISET; Σx = Σy and Σx² = Σy² make Pearson's
    * sqrt denominator a perfect square, and ρ collapses to
    * (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — one truncating ×10³ integral
    * division on DECIMAL(38,0) moments (the `knn_assortativity`
    * construction), engine-identical at both signs. NULL on a
    * degenerate all-tied frame. Precondition (holds at every gate sf
    * and is what the shared-multiset cancellation rests on): both arms
    * fill their complete top-k — i.e. ≥ k docs match ≥ 1 query term.
    */
  private val spearmanRho = DeclaredQuery(
    "spearman_rho",
    (s, d) => {
      val beyond = BmTopK.toLong + 1L
      val lex = bm25Ranked(s, d).select(col("doc_id"), col("rank").as("rl"))
      val qr = qlmRanked(s, d).select(col("doc_id"), col("rank").as("rq"))
      val u = lex
        .join(qr, Seq("doc_id"), "full_outer")
        .select(
          col("doc_id"),
          coalesce(col("rl"), lit(beyond)).as("x"),
          coalesce(col("rq"), lit(beyond)).as("y"),
        )
      val m = u.agg(
        sum(when(col("x") === beyond, 1L).otherwise(0L)).as("mx"),
      )
      u.crossJoin(broadcast(m))
        .withColumn("x2", when(col("x") < lit(beyond), lit(2L) * col("x")).otherwise(lit(41L) + col("mx")))
        .withColumn("y2", when(col("y") < lit(beyond), lit(2L) * col("y")).otherwise(lit(41L) + col("mx")))
        .agg(
          count(lit(1)).as("n_items"),
          sum("x2").as("sx"),
          sum(expr("CAST(x2 AS DECIMAL(38,0)) * y2")).as("sxy"),
          sum(expr("CAST(x2 AS DECIMAL(38,0)) * x2")).as("sxx"),
        )
        .withColumn(
          "rho_e3",
          expr("""CAST(((CAST(n_items AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sx) * 1000)
                 | DIV nullif(CAST(n_items AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0)
                 | AS BIGINT)""".stripMargin),
        )
        .select("n_items", "rho_e3")
        .orderBy("n_items")
    },
    Some(s"""WITH $evalArmsDuckCtes,
             lexq AS (SELECT doc_id, rank FROM br WHERE rank <= $BmTopK),
             qlmq AS (SELECT doc_id, rank FROM qr2 WHERE rank <= $QlmTopK),
             uq AS MATERIALIZED (SELECT coalesce(l.doc_id, q.doc_id) AS doc_id,
                          CAST(coalesce(l.rank, ${BmTopK + 1}) AS BIGINT) AS x,
                          CAST(coalesce(q.rank, ${BmTopK + 1}) AS BIGINT) AS y
                   FROM lexq l FULL OUTER JOIN qlmq q ON l.doc_id = q.doc_id),
             mm AS (SELECT CAST(sum(CASE WHEN x = ${BmTopK + 1} THEN 1 ELSE 0 END) AS BIGINT) AS mx
                    FROM uq),
             z AS (SELECT CASE WHEN x < ${BmTopK + 1} THEN 2 * x ELSE 41 + mx END AS x2,
                          CASE WHEN y < ${BmTopK + 1} THEN 2 * y ELSE 41 + mx END AS y2
                   FROM uq CROSS JOIN mm),
             g AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
                          CAST(sum(x2) AS BIGINT) AS sx,
                          sum(CAST(x2 AS HUGEINT) * y2) AS sxy,
                          sum(CAST(x2 AS HUGEINT) * x2) AS sxx
                   FROM z)
             SELECT n_items,
                    CAST(((CAST(n_items AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx) * 1000)
                         // nullif(CAST(n_items AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx, 0) AS BIGINT)
                      AS rho_e3
             FROM g ORDER BY n_items"""),
  )

  override def queries: Seq[DeclaredQuery] =
    Seq(contaminationCheck, tfidfKeywords, bm25Rank, rrfFusion, dirichletQlm, rankerAgreement,
      mmrRerank, rm3Expansion, rocchioRerank, ndcgEval, mapEval, mrrEval, kendallTau,
      spearmanRho)
}
