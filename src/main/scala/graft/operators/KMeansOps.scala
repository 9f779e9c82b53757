package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** K-means over the embeddings table — the clustering member of the
  * embedding-analytics family (centroids/outliers/covariance existed;
  * the reference's query surface has no clustering, so this is a
  * north-star LLM-pipeline operator: corpus bucketing for curriculum
  * mixes, semantic shard keys, diversity-aware sampling).
  *
  * Design (Lloyd's algorithm, Spark-first):
  *  - Vectors are ×10⁶-quantized to BIGINT and shifted non-negative, so
  *    EVERY subsequent operation — distances, argmin, centroid means —
  *    is exact integer arithmetic: bit-identical across partitionings
  *    AND across engines, which is what lets a 3-round Lloyd run
  *    hash-match a DuckDB oracle (the `embedding_covariance` ×10⁴
  *    discipline, applied to an iterative algorithm). Centroid update
  *    is floor division on non-negative sums — identical semantics to
  *    DuckDB's `//`.
  *  - Assignment is a pure map stage: k centroid literals are folded
  *    into ONE codegen'd projection (array_min over (dist, cluster)
  *    structs — ties break to the smallest cluster id by struct
  *    ordering, mirroring the oracle's ORDER BY dist, cl); no join, no
  *    shuffle, no broadcast table.
  *  - Update is one partial+final typed aggregation keyed by cluster
  *    ([[graft.functions.VecSumAggregator]]): each vector folds into a
  *    mutable D-long buffer in place; the exchange carries
  *    executors × k × D×8 B — corpus-independent. The k-row result
  *    collects to the driver (k·D longs, the BpeOps bounded-driver
  *    precedent) and feeds the next round's literals.
  *  - Empty clusters keep their previous centroid (both engines), so
  *    the round count is the only control flow.
  *
  * At 100 TB: each round is one corpus scan + one k-group partial agg —
  * the irreducible Lloyd shape. The quantized projection would be
  * persisted once (a pure map of the corpus) and re-scanned per round;
  * rounds are a driver loop over broadcast-literal centroids, so no
  * round ever shuffles the corpus. k·D driver traffic per round is
  * ~0.5 MB at k=1024, D=1024.
  */
object KMeansOps extends QueryModule {

  private val K = 8
  private val Rounds = 3
  private val Dim = 64

  /** ×10⁶ quantization + 2×10⁶ shift: |x| < 1 for the embeddings table,
    * so q ∈ (10⁶, 3×10⁶) — strictly positive keeps floor division ≡
    * truncating division in both engines.
    */
  private val QuantSql =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) + 2000000)"
  private val QuantDuck =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) + 2000000)"

  private[graft] def quantized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("label"), expr(QuantSql).as("q"))

  /** Exact integer squared distance of the vector column to one centroid
    * literal — a codegen'd fold, no explode.
    */
  private def sqDist(q: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(q, typedlit(c.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L),
      (acc, x) => acc + x,
    )

  /** Nearest centroid per row: one projection carrying (vec_id, label, q,
    * cluster, dist). Ties break to the smallest cluster id (struct
    * ordering on (dist, cluster) — the oracle's ORDER BY dist, cl).
    */
  private def assignTo(q: DataFrame, cents: Seq[Array[Long]]): DataFrame = {
    val best = array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col("q"), c).as("dist"), lit(i.toLong).as("cluster"))
    }: _*))
    q.withColumn("best", best)
      .select(
        col("vec_id"),
        col("label"),
        col("q"),
        col("best.cluster").as("cluster"),
        col("best.dist").as("dist"),
      )
  }

  /** `Rounds` Lloyd updates from the deterministic seed (the k lowest
    * vec_ids' vectors), returning the final centroids; the final
    * assignment is one more [[assignTo]] under them.
    */
  private[graft] def lloydCentroids(s: SparkSession, d: String): Seq[Array[Long]] = {
    val q = quantized(s, d)
    val vecSum = udaf(new graft.functions.VecSumAggregator(Dim))
    var cents: Seq[Array[Long]] = q
      .orderBy("vec_id")
      .limit(K)
      .collect()
      .map(_.getSeq[Long](2).toArray)
      .toSeq
    var r = 0
    while (r < Rounds) {
      val updates = assignTo(q, cents)
        .groupBy("cluster")
        .agg(vecSum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(row => row.getLong(0).toInt -> (row.getSeq[Long](1), row.getLong(2)))
        .toMap
      cents = cents.zipWithIndex.map { case (prev, cl) =>
        updates.get(cl) match {
          case Some((sums, n)) => sums.map(_ / n).toArray // non-negative: floor ≡ trunc ≡ //
          case None => prev // empty cluster keeps its centroid, both engines
        }
      }
      r += 1
    }
    cents
  }

  private def finalAssign(s: SparkSession, d: String): DataFrame =
    assignTo(quantized(s, d), lloydCentroids(s, d))

  // ---- oracle: the same Lloyd run unrolled as DuckDB CTEs ----------------

  /** CTE chain shared by the three kmeans oracles: quantize → explode to
    * (vec_id, dim, val) → seed c0 from the k lowest vec_ids → `Rounds`
    * unrolled (distance agg, argmin window, per-cluster dim sums, floor
    * division with empty-cluster carry) → final assignment `af`.
    * Generated, not hand-written, so the round count is one constant.
    */
  private def lloydCtes: String = {
    val init =
      s"""q AS (SELECT vec_id, label, $QuantDuck AS q FROM embeddings),
         |pe AS (SELECT vec_id, CAST(generate_subscripts(q, 1) - 1 AS INTEGER) AS dim,
         |              unnest(q) AS val FROM q),
         |init AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
         |         FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT $K)),
         |c0 AS (SELECT init.cl, pe.dim, pe.val FROM init JOIN pe ON init.vec_id = pe.vec_id)""".stripMargin
    val rounds = (1 to Rounds)
      .map { r =>
        s"""d$r AS (SELECT pe.vec_id, c.cl, sum((pe.val - c.val) * (pe.val - c.val)) AS dist
           |       FROM pe JOIN c${r - 1} c ON pe.dim = c.dim GROUP BY 1, 2),
           |a$r AS (SELECT vec_id, cl,
           |              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn FROM d$r),
           |s$r AS (SELECT a.cl, pe.dim, CAST(sum(pe.val) AS BIGINT) AS sv, count(*) AS n
           |       FROM (SELECT vec_id, cl FROM a$r WHERE rn = 1) a
           |       JOIN pe ON a.vec_id = pe.vec_id GROUP BY 1, 2),
           |c$r AS (SELECT p.cl, p.dim, coalesce(s.sv // s.n, p.val) AS val
           |       FROM c${r - 1} p LEFT JOIN s$r s ON p.cl = s.cl AND p.dim = s.dim)""".stripMargin
      }
      .mkString(",\n")
    val fin =
      s"""df AS (SELECT pe.vec_id, c.cl, sum((pe.val - c.val) * (pe.val - c.val)) AS dist
         |      FROM pe JOIN c$Rounds c ON pe.dim = c.dim GROUP BY 1, 2),
         |af AS (SELECT vec_id, cl, dist,
         |             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn FROM df)""".stripMargin
    s"$init,\n$rounds,\n$fin"
  }

  // ---- declared queries ---------------------------------------------------

  private val kmeansAssign = DeclaredQuery(
    "kmeans_assign",
    (s, d) => finalAssign(s, d).select("vec_id", "cluster", "dist").orderBy("vec_id"),
    Some(s"""WITH $lloydCtes
             SELECT vec_id, CAST(cl AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist
             FROM af WHERE rn = 1 ORDER BY vec_id"""),
  )

  private val kmeansCost = DeclaredQuery(
    "kmeans_cost",
    (s, d) =>
      finalAssign(s, d)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum("dist").as("sse"))
        .orderBy("cluster"),
    Some(s"""WITH $lloydCtes
             SELECT CAST(cl AS BIGINT) AS cluster, count(*) AS n, CAST(sum(dist) AS BIGINT) AS sse
             FROM af WHERE rn = 1 GROUP BY 1 ORDER BY 1"""),
  )

  private val kmeansCentroids = DeclaredQuery(
    "kmeans_centroids",
    (s, d) => {
      import s.implicits._
      lloydCentroids(s, d).zipWithIndex
        .flatMap { case (c, cl) =>
          c.zipWithIndex.map { case (v, dim) => (cl.toLong, dim, v) }
        }
        .toDF("cluster", "dim", "val")
        .orderBy("cluster", "dim")
    },
    Some(s"""WITH $lloydCtes
             SELECT CAST(cl AS BIGINT) AS cluster, dim, val FROM c$Rounds
             ORDER BY cluster, dim"""),
  )

  /** Nearest-label-centroid classifier confusion matrix: per-label mean
    * vectors (same exact-integer centroid arithmetic), every vector
    * assigned to its nearest label centroid, (label, pred) counts — the
    * embedding-space analogue of `lang_confusion`, the eval an embedding
    * pipeline runs to see whether labels are linearly separated by
    * their centroids. One agg for centroids (bounded collect: labels ×
    * D) + one codegen'd assignment projection + one count agg.
    */
  private val nearestCentroidConfusion = DeclaredQuery(
    "nearest_centroid_confusion",
    (s, d) => {
      val q = quantized(s, d)
      val vecSum = udaf(new graft.functions.VecSumAggregator(Dim))
      val cents = q
        .groupBy("label")
        .agg(vecSum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1).map(_ / r.getLong(2)).toArray)
        .sortBy(_._1)
      val best = array_min(array(cents.map { case (lbl, c) =>
        struct(sqDist(col("q"), c).as("dist"), lit(lbl).as("pred"))
      }: _*))
      q.withColumn("pred", best.getField("pred"))
        .groupBy("label", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    },
    Some(s"""WITH q AS (SELECT vec_id, label, $QuantDuck AS q FROM embeddings),
             pe AS (SELECT vec_id, label, CAST(generate_subscripts(q, 1) - 1 AS INTEGER) AS dim,
                           unnest(q) AS val FROM q),
             lc AS (SELECT label AS cl, dim, CAST(sum(val) AS BIGINT) // count(*) AS cval
                    FROM pe GROUP BY 1, 2),
             d AS (SELECT pe.vec_id, lc.cl, sum((pe.val - lc.cval) * (pe.val - lc.cval)) AS dist
                   FROM pe JOIN lc ON pe.dim = lc.dim GROUP BY 1, 2),
             a AS (SELECT vec_id, cl,
                          row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn FROM d)
             SELECT q.label, CAST(a.cl AS INTEGER) AS pred, count(*) AS n
             FROM a JOIN q ON a.vec_id = q.vec_id WHERE a.rn = 1
             GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  val queries: Seq[DeclaredQuery] =
    Seq(kmeansAssign, kmeansCost, kmeansCentroids, nearestCentroidConfusion)
}
