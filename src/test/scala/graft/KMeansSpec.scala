package graft

import org.apache.spark.sql.functions._

/** Invariants of the k-means family beyond the DuckDB hash gate: the
  * assignment really is the argmin of the published centroids (checked
  * independently of the engine's argmin expression), the cost rolls up
  * the assignment exactly, reruns are bit-identical, and empty clusters
  * carry their previous centroid (the contract both engines implement).
  */
class KMeansSpec extends SparkSpec {

  private def centroidsOf(d: String): Map[Long, Array[Long]] =
    SparkEntry
      .queries("kmeans_centroids")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (cl, rows) => cl -> rows.sortBy(_._2).map(_._3) }

  test("kmeans_assign is the argmin of kmeans_centroids, ties to the smallest cluster") {
    val cents = centroidsOf(sfDir)
    assert(cents.keySet == (0L until 8L).toSet)
    val q = operators.KMeansOps
      .quantized(spark, sfDir)
      .select("vec_id", "q")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val assigned = SparkEntry
      .queries("kmeans_assign")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(assigned.length == q.size)
    assigned.foreach { case (id, cl, dist) =>
      val v = q(id)
      val best = cents.toSeq
        .map { case (c, cent) =>
          var s = 0L
          var i = 0
          while (i < v.length) { val d0 = v(i) - cent(i); s += d0 * d0; i += 1 }
          (s, c)
        }
        .min // (dist, cluster) lexicographic — the declared tie rule
      assert((dist, cl) == best,
        s"vec $id: declared ($dist, $cl) vs independent argmin $best")
    }
  }

  test("kmeans_cost rolls up the assignment exactly; reruns are bit-identical") {
    val assigned = SparkEntry
      .queries("kmeans_assign")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val expect = assigned
      .groupBy(_._1)
      .map { case (cl, rows) => (cl, rows.length.toLong, BigInt(rows.map(_._2).sum)) }
      .toSeq
      .sortBy(_._1)
    val cost = SparkEntry
      .queries("kmeans_cost")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigInt(r.getLong(2))))
      .toSeq
    assert(cost == expect, "per-cluster n/sse must aggregate the assignment")
    val rerun = SparkEntry
      .queries("kmeans_cost")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigInt(r.getLong(2))))
      .toSeq
    assert(rerun == cost, "integer Lloyd must be deterministic across runs")
  }

  test("empty clusters keep their previous centroid (two-point corpus)") {
    import spark.implicits._
    // 12 vectors but only TWO distinct points: seeds 0..5 are copies of A,
    // 6..7 copies of B, so after round 1 every A-point ties to cluster 0
    // and every B-point to cluster 6 — clusters 1..5 and 7 are empty for
    // the whole run and must carry their seed centroids unchanged.
    val a = Array.fill(64)(0.1f)
    val b = Array.fill(64)(-0.2f)
    val dir = java.nio.file.Files.createTempDirectory("kmeans-blob").toString
    (0 until 12)
      .map(i => (i.toLong, if (i < 6) a else b, if (i < 6) 0 else 1))
      .toDF("vec_id", "embedding", "label")
      .write
      .parquet(s"$dir/embeddings.parquet")
    val clusters = SparkEntry
      .queries("kmeans_assign")(spark, dir)
      .select("cluster")
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(clusters == Set(0L, 6L),
      "identical points must collapse onto the smallest tied cluster ids")
    val cents = centroidsOf(dir)
    val qa = cents(0L) // occupied A cluster
    val qb = cents(6L) // occupied B cluster
    Seq(1L, 2L, 3L, 4L, 5L).foreach(cl =>
      assert(cents(cl).sameElements(qa), s"empty cluster $cl must keep its A seed"))
    assert(cents(7L).sameElements(qb), "empty cluster 7 must keep its B seed")
    val conf = SparkEntry
      .queries("nearest_centroid_confusion")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(conf == Set((0, 0, 6L), (1, 1, 6L)),
      "separable blobs must classify perfectly by nearest label centroid")
  }

  test("pca_power_iter is near-converged: M·v stays colinear with v") {
    // Independent check of the eigen property (the oracle only proves
    // both engines run the SAME arithmetic, not that the arithmetic
    // approximates the dominant eigenvector): rebuild M = n·Σqq' − SS'
    // from collected quantized vectors and verify one more power step
    // barely rotates the returned direction.
    val v = operators.KMeansOps.principalE6(spark, sfDir).map(BigInt(_))
    val qs = operators.KMeansOps
      .quantized(spark, sfDir)
      .select("q")
      .collect()
      .map(_.getSeq[Long](0).map(BigInt(_)).toArray)
    val dim = v.length
    val n = BigInt(qs.length)
    val sm = Array.tabulate(dim)(i => qs.map(_(i)).sum)
    val y = Array.tabulate(dim) { i =>
      // (M·v)_i = n·Σ_j P_ij v_j − S_i·(S·v)
      val pv = qs.map(q => q(i) * q.indices.map(j => q(j) * v(j)).sum).sum
      n * pv - sm(i) * sm.indices.map(j => sm(j) * v(j)).sum
    }
    def dot(a: Array[BigInt], b: Array[BigInt]) = a.indices.map(i => a(i) * b(i)).sum
    val cos = BigDecimal(dot(y, v)).doubleValue /
      math.sqrt(BigDecimal(dot(y, y)).doubleValue * BigDecimal(dot(v, v)).doubleValue)
    // This synthetic corpus has a small eigen-gap (measured λ₂/λ₁ ≈
    // 0.96: sin shrinks ~0.96×/step, cos = 0.9986 at 12 steps), so the
    // bound asserts near-invariance, not machine-precision convergence;
    // a random 64-dim direction scores ~0.12 and a broken M ~0.
    assert(cos > 0.995, s"after the power steps M·v must align with v (cos = $cos)")
    assert(v.map(_.abs).max == BigInt(1000000), "v is normalized to max|component| = 1e6")
  }

  test("family queries share one Lloyd run / one moments pass (driver-value memo)") {
    // The SubstrateCache discipline for driver values: a second call
    // must return the SAME object, not a recomputation — this is what
    // keeps assign/cost/centroids/silhouette/profile from each paying
    // the corpus iterations in Bench and Verify.
    val a = operators.KMeansOps.lloydCentroids(spark, sfDir)
    val b = operators.KMeansOps.lloydCentroids(spark, sfDir)
    assert(a eq b, "lloydCentroids must memoize per (session, dataset)")
    val p = operators.KMeansOps.principalE6(spark, sfDir)
    val q = operators.KMeansOps.principalE6(spark, sfDir)
    assert(p eq q, "principalE6 must memoize per (session, dataset)")
  }

  test("VecSumAggregator fails loudly at Long scale (no silent wrap)") {
    // The centroid accumulator is JVM code — ANSI guards Catalyst
    // expressions, not typed Aggregators — so the loud-failure contract
    // is Math.addExact's (the CovMomentsAggregator discipline).
    val agg = new graft.functions.VecSumAggregator(2)
    val big = Long.MaxValue / 2 + 1
    val one = agg.reduce(agg.zero, Seq(big, 1L))
    intercept[ArithmeticException] { agg.reduce(one, Seq(big, 1L)) }
    val other = agg.reduce(agg.zero, Seq(big, 1L))
    intercept[ArithmeticException] { agg.merge(agg.reduce(agg.zero, Seq(big, 1L)), other) }
  }
}
