package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index over an embedding column — the
  * clustering-based scale path beside the LSH one (SimilarityOps):
  * partition vectors by nearest centroid, then search only `nprobe`
  * cells per query.
  *
  * Everything is DataFrame ops + the native cosine expression:
  *  - deterministic seeding (stride over vec_id — no RNG state);
  *  - Lloyd refinement as posexplode → per-(cell, dim) mean → re-assemble;
  *  - assignment and search are broadcast joins against the tiny centroid
  *    table, so the vector table never shuffles except the final
  *    per-query top-k window.
  *
  * At 100 TB: assignments are written bucketed by cell id; a query then
  * touches nprobe buckets. The centroid build samples the corpus — here
  * it uses all vectors because the table is small.
  */
object Ivf {

  private def sim(s: SparkSession, a: String, b: String) = {
    graft.functions.GraftFunctions.register(s)
    expr(s"cosine_similarity($a, $b)")
  }

  /** k deterministic seeds refined by `iters` Lloyd iterations.
    * @param e (vec_id, dvec: array<double>)
    * @return (cid: int, cvec: array<double>)
    */
  def buildCentroids(s: SparkSession, e: DataFrame, k: Int, iters: Int): DataFrame = {
    val n = e.count()
    val stride = math.max(n / k, 1L)
    var centroids = e
      .filter(col("vec_id") % stride === 0)
      .orderBy("vec_id")
      .limit(k)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).as("cid"),
        col("dvec").as("cvec"),
      )
    (0 until iters).foreach { _ =>
      val assigned = assign(s, e, centroids)
      val byDim = assigned
        .join(e, "vec_id")
        .select(col("cid"), posexplode(col("dvec")).as(Seq("k", "v")))
        .groupBy("cid", "k")
        .agg(avg("v").as("m"))
      centroids = byDim
        .groupBy("cid")
        .agg(
          expr("transform(array_sort(collect_list(struct(k, m))), x -> x.m)").as("cvec"),
        )
    }
    centroids
  }

  /** Nearest-centroid assignment: broadcast the centroids, window-argmax.
    * @return (vec_id, cid, csim)
    */
  def assign(s: SparkSession, e: DataFrame, centroids: DataFrame): DataFrame =
    e.join(broadcast(centroids))
      .withColumn("csim", sim(s, "dvec", "cvec"))
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))),
      )
      .filter(col("rk") === 1)
      .select("vec_id", "cid", "csim")

  /** Search: per query, rank cells by centroid similarity, take `nprobe`,
    * then exact top-k within the probed cells.
    * @param queries (qid, qvec)
    * @return (qid, rank, cid: candidate vec_id, sim)
    */
  def searchTopK(
      s: SparkSession,
      e: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      nprobe: Int,
      topk: Int,
  ): DataFrame = {
    val cells = queries
      .join(broadcast(centroids))
      .withColumn("csim", sim(s, "qvec", "cvec"))
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy("qid").orderBy(col("csim").desc, col("cid"))),
      )
      .filter(col("rk") <= nprobe)
      .select("qid", "qvec", "cid")
    val assigned = assign(s, e, centroids).select(col("vec_id"), col("cid"))
    cells
      .join(assigned, "cid")
      .join(e.select(col("vec_id"), col("dvec").as("cand_vec")), "vec_id")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", sim(s, "qvec", "cand_vec"))
      .withColumn(
        "rank",
        row_number().over(Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))),
      )
      .filter(col("rank") <= topk)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id").as("cid"), col("sim"))
      .orderBy("qid", "rank")
  }
}
