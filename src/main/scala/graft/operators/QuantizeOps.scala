package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._

/** Embedding quantization — the storage tier of a 100 TB similarity
  * stack: int8 scalar quantization (per-vector symmetric max-abs scale)
  * shrinks the vector corpus 4× before it is ever shuffled or cached,
  * and the reconstruction error column is the quality gate for whether
  * the ANN tiers (LSH, IVF) may search quantized vectors.
  *
  * Determinism across engines: the scale is one exact double division of
  * an `array_max`; quantized values use `floor(x + 0.5)` (floor is exact
  * on doubles, identical in Spark and DuckDB — never CAST(double AS INT),
  * which rounds in DuckDB but truncates in Spark); the error sum is a
  * sequential left fold (`aggregate` ≡ `list_reduce`).
  */
object QuantizeOps extends QueryModule {

  /** The SQ8 code table — (vec_id, dvec, scale, qv) — materialized ONCE
    * per (session, dataset) via [[graft.SubstrateCache]] and shared by
    * every quantized consumer (`embedding_quantize`, `quantized_topk`,
    * `ivf_quantized_topk`), matching the other ANN tiers' substrates.
    *
    * This is also the structural fix for the CollapseProject O(d²) trap:
    * a downstream query that prunes columns can leave `scale`
    * single-referenced, at which point the optimizer inlines
    * `array_max(transform(dvec, abs))` into the quantize lambda and
    * re-evaluates it PER ELEMENT. Behind the persisted substrate the
    * codes are computed exactly once at materialization (where `scale`
    * is multi-referenced — build plan keeps it a separate Project), and
    * consumers read cached rows, never the quantize expression.
    *
    * The scale is floored at 1e-12 so an all-zero vector quantizes to
    * all-zero codes instead of NaN (0/0) — guarded identically in the
    * oracles, since CAST(NaN) diverges between engines.
    */
  private[operators] def sq8Codes(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    graft.SubstrateCache.substrate(s, d, "sq8-codes")(sq8Build(s, d))

  private def sq8Build(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): org.apache.spark.sql.DataFrame =
    embeddings(s, d)
      .withColumn("dvec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn(
        "scale",
        expr("greatest(array_max(transform(dvec, v -> abs(v))) / 127.0D, 1e-12D)"),
      )
      .withColumn("qv", expr("transform(dvec, v -> CAST(floor(v / scale + 0.5D) AS BIGINT))"))
      .select("vec_id", "dvec", "scale", "qv")

  /** Optimized plan of the (unpersisted) substrate build — spec hook for
    * asserting the scale stays single-computed (never lambda-inlined).
    */
  def sq8CodesBuildPlan(s: org.apache.spark.sql.SparkSession, d: String): String =
    sq8Build(s, d).queryExecution.optimizedPlan.toString

  /** The oracle-side twin of [[sq8Codes]], spliced into each consumer's
    * SQL so the quantization definition can never drift between the
    * Spark substrate and the DuckDB oracles.
    */
  private[operators] val Sq8OracleCte =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS dvec FROM embeddings),
       sc AS (SELECT vec_id, dvec,
                     greatest(list_max(list_transform(dvec, v -> abs(v))) / 127.0, 1e-12) AS scale
              FROM e),
       qz AS (SELECT vec_id, dvec, scale,
                     list_transform(dvec, v -> CAST(floor(v / scale + 0.5) AS BIGINT)) AS qv
              FROM sc)"""

  private val embeddingQuantize = DeclaredQuery(
    "embedding_quantize",
    (s, d) =>
      sq8Codes(s, d)
        .select(
          col("vec_id"),
          Disp.roundz(col("scale"), 6).as("scale"),
          expr("CAST(array_min(qv) AS INT)").as("q_min"),
          expr("CAST(array_max(qv) AS INT)").as("q_max"),
          expr("""round(aggregate(zip_with(dvec, qv, (v, qq) -> abs(v - qq * scale)),
                                  0.0D, (a, x) -> a + x) / size(dvec), 6)""")
            .as("mean_abs_err"),
        )
        .orderBy("vec_id"),
    Some(s"""WITH $Sq8OracleCte
            SELECT vec_id, round(scale, 6) AS scale,
                   CAST(list_min(qv) AS INT) AS q_min, CAST(list_max(qv) AS INT) AS q_max,
                   round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                           list_transform(range(1, len(dvec) + 1),
                                          i -> abs(dvec[i] - qv[i] * scale))),
                         (a, x) -> a + x) / len(dvec), 6) AS mean_abs_err
            FROM qz ORDER BY vec_id"""),
  )

  /** Quantized search with exact rescoring (the SQ8-then-rescore pattern
    * every production ANN stack runs): the coarse pass scores candidates
    * with the INT dot product of the int8 codes — a BIGINT sum, exactly
    * representable, so the coarse ranking is bit-deterministic across
    * engines and partitionings — then only the per-query top-`Rescore`
    * survivors pay the full-precision cosine. At 100 TB the coarse scan
    * reads 1/4 the bytes of the float corpus and the exact rescore
    * touches `queries × Rescore` vectors, not the corpus.
    */
  private val NQueries = 8
  private val Rescore = 20
  private val TopK = 10

  private val quantizedTopk = DeclaredQuery(
    "quantized_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val qz = sq8Codes(s, d)
      val q = qz
        .filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("dvec").as("qvec"), col("qv").as("qqv"))
      val c = qz.select(col("vec_id").as("cid"), col("dvec").as("cvec"), col("qv").as("cqv"))
      broadcast(q)
        .join(c, col("qid") =!= col("cid"))
        // exact BIGINT code dot — the coarse score's ordering key; native
        // codegen kernel (graft.functions.IntDot), not an interpreted HOF
        .withColumn("qdot", expr("graft_int_dot(qqv, cqv)"))
        .withColumn(
          "crank",
          row_number().over(Window.partitionBy("qid").orderBy(col("qdot").desc, col("cid"))),
        )
        .filter(col("crank") <= Rescore)
        .withColumn("sim", Disp.roundz(expr("cosine_similarity(qvec, cvec)"), 6))
        .withColumn(
          "rank",
          row_number().over(Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))),
        )
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"),
          col("qdot"), col("sim"))
        .orderBy("qid", "rank")
    },
    Some(s"""WITH $Sq8OracleCte,
             en AS (SELECT vec_id, dvec, qv,
                           sqrt(list_inner_product(dvec, dvec)) AS nrm
                    FROM qz),
             p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.qv[i])),
                            (s2, x) -> s2 + x) AS qdot,
                          q.dvec AS qvec, q.nrm AS qnrm, c.dvec AS cvec, c.nrm AS cnrm
                   FROM en q JOIN en c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
             cr AS (SELECT qid, cid, qdot, qvec, qnrm, cvec, cnrm,
                           row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, cid) AS crank
                    FROM p),
             rs AS (SELECT qid, cid, qdot,
                           (round(list_inner_product(qvec, cvec) / (qnrm * cnrm), 6) + 0.0) AS sim
                    FROM cr WHERE crank <= $Rescore),
             r AS (SELECT qid, cid, qdot, sim,
                          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
                   FROM rs)
             SELECT qid, CAST(rank AS BIGINT) AS rank, cid, qdot, sim
             FROM r WHERE rank <= $TopK ORDER BY qid, rank"""),
  )

  /** Per-dimension embedding moment statistics — the encoder-health and
    * quantizer-calibration read (a collapsed dimension shows variance ≈
    * 0; a heavy-tailed one argues per-DIM scale over per-vector max-abs;
    * dead dims are the first symptom of a broken encoder export).
    * Values scale to exact ×10⁶ BIGINTs BEFORE aggregation, so Σx and
    * Σx² are order-invariant integer sums (the `corr_stats` discipline
    * on the array domain) and mean/variance are single divisions of
    * exact integers via shared expression text. One posexplode + one
    * (pos)-keyed map-side-combined agg — the exchange is dims ×
    * partitions rows, the vectors never shuffle.
    *
    * The variance products n·Σx² and (Σx)² run in the WIDE tier
    * (DECIMAL(38,0) ≡ DuckDB HUGEINT): n·Σx² ≈ n²·10¹² crosses 2⁶³ at
    * ~25k vectors — the round-14 full-suite sf2 sweep caught exactly
    * this (green at sf1's 20k, ANSI loud-fail at sf2's 40k), vindicating
    * the loud-overflow discipline and the second measured decade point.
    * The round-15 magnitude census then found the SAME class one level
    * down: Σx² itself (sv² ≤ 10¹²) crosses 2⁶³ at ~10⁷ vectors, so the
    * s2 accumulator-and-output now rides the wide tier too (s1 is
    * Long-safe to ~10¹² rows and stays BIGINT). Both engines cast the
    * exact wide integer to DOUBLE before the one defined division, so
    * results are bit-identical and unchanged at every sf where the Long
    * tier was valid.
    */
  private val embeddingDimStats = DeclaredQuery(
    "embedding_dim_stats",
    (s, d) =>
      embeddings(s, d)
        .select(
          posexplode(
            expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))"),
          ).as(Seq("pos", "sv")),
        )
        .groupBy("pos")
        .agg(
          count(lit(1)).as("n"),
          // s1 is Long-safe to ~10¹² rows (|sv| ≤ 10⁶); s2 is NOT —
          // sv² ≤ 10¹² means a BIGINT Σ crosses 2⁶³ at ~10⁷ vectors
          // (round-15 census; the r14 sweep only caught the n·Σx²
          // product, at ~2.5×10⁴). s2 itself now rides the wide tier.
          sum("sv").as("s1"),
          sum((col("sv").cast("decimal(38,0)") * col("sv")).cast("decimal(38,0)")).as("s2"),
        )
        .withColumn("pos", col("pos").cast("long"))
        .withColumn(
          "mean",
          expr("CAST(floor(CAST(s1 AS DOUBLE) / n + 0.5) AS BIGINT)"),
        )
        .withColumn(
          "var_e12",
          // s2 is already DECIMAL(38,0); ANSI checks the n·s2 product
          expr("""CAST(floor(CAST(CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
                 |           / CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) + 0.5) AS BIGINT)""".stripMargin),
        )
        // s2 DECLARES as BIGINT ("BIGINT means out", round-15 finding):
        // the wide accumulator stays inside var_e12's exact arithmetic;
        // under ANSI the output cast fails loudly past 2⁶³.
        .select(col("pos"), col("n"), col("s1"), col("s2").cast("long").as("s2"), col("mean"), col("var_e12"))
        .orderBy("pos"),
    Some("""WITH x AS (SELECT CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS sv,
                              CAST(pos - 1 AS BIGINT) AS pos
                       FROM (SELECT unnest(embedding) AS v,
                                    generate_subscripts(embedding, 1) AS pos
                             FROM embeddings)),
            a AS (SELECT pos, count(*) AS n,
                         CAST(sum(sv) AS BIGINT) AS s1,
                         CAST(sum(CAST(sv AS HUGEINT) * sv) AS HUGEINT) AS s2
                  FROM x GROUP BY 1)
            SELECT pos, n, s1, CAST(s2 AS BIGINT) AS s2,
                   CAST(floor(CAST(s1 AS DOUBLE) / n + 0.5) AS BIGINT) AS mean,
                   CAST(floor(CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                              / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) + 0.5) AS BIGINT) AS var_e12
            FROM a ORDER BY pos"""),
  )

  /** Random-projection (Johnson–Lindenstrauss) dimensionality reduction
    * 64 → 8 dims with a deterministic ±1 sign matrix (Achlioptas 2003
    * showed ±1 entries preserve JL's distance guarantees — no Gaussians
    * needed) — the cheap front-end of every large-scale embedding
    * pipeline: 8× less vector I/O for downstream clustering/ANN, with
    * the same banded-code substrates applying unchanged on the projected
    * space. Sign s(j,k) comes from the suite's shared integer hash
    * formula ((j·73856093 + k·19349663) mod 10007, parity) — a literal
    * in both engines, no RNG state, no model file.
    *
    * Determinism: inputs quantize to exact ×10⁴ BIGINTs first (the
    * `embedding_covariance` discipline), so each output component is an
    * exact integer fold — no float enters the projection at all.
    *
    * Plan: pure scan-local HOF arithmetic, zero shuffle beyond the
    * presentation sort; at 100 TB this is the embarrassingly-parallel
    * map stage it should be, and the 8 output longs per row are the
    * only bytes that leave the scan.
    */
  private val jlProject = DeclaredQuery(
    "jl_project",
    (s, d) => {
      val q = embeddings(s, d)
        .withColumn(
          "qv",
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))"),
        )
      val ys = (0 until 8).map { j =>
        expr(
          s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
             |  (acc, k) -> acc + qv[k] *
             |    (CASE WHEN ((($j * 73856093 + k * 19349663) % 10007) % 2) = 0
             |          THEN 1 ELSE -1 END))""".stripMargin,
        ).as(s"y$j")
      }
      q.select(col("vec_id") +: ys: _*).orderBy("vec_id")
    },
    Some {
      val ysDuck = (0 until 8)
        .map { j =>
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
             |  list_transform(generate_series(0, 63), k -> qv[k + 1] *
             |    (CASE WHEN ((($j * 73856093 + k * 19349663) % 10007) % 2) = 0
             |          THEN 1 ELSE -1 END))), (a, x) -> a + x) AS y$j""".stripMargin
        }
        .mkString(",\n                    ")
      s"""WITH q AS (SELECT vec_id,
                            list_transform(embedding::DOUBLE[],
                              x -> CAST(floor(x * 10000.0 + 0.5) AS BIGINT)) AS qv
                     FROM embeddings)
             SELECT vec_id,
                    $ysDuck
             FROM q ORDER BY vec_id"""
    },
  )

  val queries: Seq[DeclaredQuery] =
    Seq(embeddingQuantize, quantizedTopk, embeddingDimStats, jlProject)

  /** Deflate-compression-ratio quality signal (compressed/raw bytes): the
    * classic cheap gibberish/boilerplate detector a pretraining pipeline
    * runs beside [[TextOps]]' stats — highly repetitive text compresses
    * far below prose, random text above it. Library operator (no SQL
    * mirror — DuckDB has no deflate): one `Deflater` per partition,
    * reused across rows, zero shuffle; only counts leave the partition.
    */
  def compressionRatio(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    graft.Tables
      .documents(s, d)
      .select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes("UTF-8")
          deflater.reset(); deflater.setInput(in); deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          (id, in.length.toLong, n, math.round(n.toDouble / in.length * 10000) / 10000.0)
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio")
  }
}
