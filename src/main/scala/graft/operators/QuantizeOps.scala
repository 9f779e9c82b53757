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

  private val embeddingQuantize = DeclaredQuery(
    "embedding_quantize",
    (s, d) =>
      embeddings(s, d)
        .withColumn("dvec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("scale", expr("array_max(transform(dvec, v -> abs(v))) / 127.0D"))
        .withColumn("q", expr("transform(dvec, v -> CAST(floor(v / scale + 0.5D) AS INT))"))
        .select(
          col("vec_id"),
          round(col("scale"), 6).as("scale"),
          expr("array_min(q)").as("q_min"),
          expr("array_max(q)").as("q_max"),
          expr("""round(aggregate(zip_with(dvec, q, (v, qq) -> abs(v - qq * scale)),
                                  0.0D, (a, x) -> a + x) / size(dvec), 6)""")
            .as("mean_abs_err"),
        )
        .orderBy("vec_id"),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS dvec FROM embeddings),
            sc AS (SELECT vec_id, dvec,
                          list_max(list_transform(dvec, v -> abs(v))) / 127.0 AS scale
                   FROM e),
            q AS (SELECT vec_id, dvec, scale,
                         list_transform(dvec, v -> CAST(floor(v / scale + 0.5) AS INT)) AS qv
                  FROM sc)
            SELECT vec_id, round(scale, 6) AS scale,
                   list_min(qv) AS q_min, list_max(qv) AS q_max,
                   round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                           list_transform(range(1, len(dvec) + 1),
                                          i -> abs(dvec[i] - qv[i] * scale))),
                         (a, x) -> a + x) / len(dvec), 6) AS mean_abs_err
            FROM q ORDER BY vec_id"""),
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
      val qz = embeddings(s, d)
        .withColumn("dvec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("scale", expr("array_max(transform(dvec, v -> abs(v))) / 127.0D"))
        .withColumn("qv", expr("transform(dvec, v -> CAST(floor(v / scale + 0.5D) AS BIGINT))"))
      val q = qz
        .filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("dvec").as("qvec"), col("qv").as("qqv"),
          col("scale").as("qscale"))
      val c = qz.select(col("vec_id").as("cid"), col("dvec").as("cvec"), col("qv").as("cqv"),
        col("scale").as("cscale"))
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
        .withColumn("sim", round(expr("cosine_similarity(qvec, cvec)"), 6))
        .withColumn(
          "rank",
          row_number().over(Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))),
        )
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("cid"),
          col("qdot"), col("sim"))
        .orderBy("qid", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS dvec,
                               sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
                        FROM embeddings),
             sc AS (SELECT vec_id, dvec, nrm,
                           list_max(list_transform(dvec, v -> abs(v))) / 127.0 AS scale
                    FROM e),
             qz AS (SELECT vec_id, dvec, nrm,
                           list_transform(range(1, len(dvec) + 1),
                                          i -> CAST(floor(dvec[i] / scale + 0.5) AS BIGINT)) AS qv
                    FROM sc),
             p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                          list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.qv[i])),
                            (s2, x) -> s2 + x) AS qdot,
                          q.dvec AS qvec, q.nrm AS qnrm, c.dvec AS cvec, c.nrm AS cnrm
                   FROM qz q JOIN qz c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
             cr AS (SELECT qid, cid, qdot, qvec, qnrm, cvec, cnrm,
                           row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, cid) AS crank
                    FROM p),
             rs AS (SELECT qid, cid, qdot,
                           round(list_inner_product(qvec, cvec) / (qnrm * cnrm), 6) AS sim
                    FROM cr WHERE crank <= $Rescore),
             r AS (SELECT qid, cid, qdot, sim,
                          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
                   FROM rs)
             SELECT qid, CAST(rank AS BIGINT) AS rank, cid, qdot, sim
             FROM r WHERE rank <= $TopK ORDER BY qid, rank"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(embeddingQuantize, quantizedTopk)

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
