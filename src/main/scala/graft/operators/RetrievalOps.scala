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
  *  - `tfidf_keywords` shuffles (doc_id, term-hash) pairs for tf, then
  *    the vocabulary-sized df table broadcasts back — corpus-sized data
  *    crosses the wire once. The per-doc top-k window partitions by
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
  private[graft] def benchmarkGrams(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame = {
    val src = documents(s, d).select(col("doc_id"), col("source"))
    DedupOps
      .gramRows(s, d)
      .join(broadcast(src), Seq("doc_id"))
      .filter(col("source") === BenchmarkSource)
      .select("gh")
      .distinct()
  }

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
    * Physical shape: gram substrate → join doc→source (broadcast dim) →
    * distinct benchmark shingle set (broadcast) → equi-join + per-doc
    * count. The shingle hashes are already distinct per document in the
    * substrate, so `count(*)` per doc IS the distinct leaked-gram count.
    */
  private val contaminationCheck = DeclaredQuery(
    "contamination_check",
    (s, d) => {
      val src = documents(s, d).select(col("doc_id"), col("source"))
      val corpusGrams = DedupOps
        .gramRows(s, d)
        .join(broadcast(src), Seq("doc_id"))
        .filter(col("source") =!= BenchmarkSource)
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
      val scored = tf
        .join(broadcast(dfT), Seq("term"))
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

  override def queries: Seq[DeclaredQuery] =
    Seq(contaminationCheck, tfidfKeywords)
}
