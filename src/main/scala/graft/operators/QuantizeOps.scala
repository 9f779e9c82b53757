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

  val queries: Seq[DeclaredQuery] = Seq(embeddingQuantize)
}
