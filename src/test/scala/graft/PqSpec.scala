package graft

import org.apache.spark.sql.functions._
import graft.operators.PqOps

/** PQ quantizer invariants: codebook/code-table shape, code range, and
  * useful ADC recall against the exact brute-force top-k.
  */
class PqSpec extends SparkSpec {

  test("codebook is NSub x K centroids of SubDim dims") {
    val cb = PqOps.codebook(spark, sfDir).collect()
    assert(cb.length == 8 * 16, s"expected 128 centroids, got ${cb.length}")
    assert(cb.forall(_.getAs[Seq[Double]]("cvec").length == 8))
  }

  test("every vector encodes to NSub codes in [0, K)") {
    val c = PqOps
      .codes(spark, sfDir)
      .select(
        count(lit(1)).as("n"),
        min(expr("array_min(carr)")).as("lo"),
        max(expr("array_max(carr)")).as("hi"),
        min(size(col("carr"))).as("w0"),
        max(size(col("carr"))).as("w1"),
      )
      .collect()(0)
    val total = Tables.embeddings(spark, sfDir).count()
    assert(c.getAs[Long]("n") == total, "every corpus vector must be encoded")
    assert(c.getAs[Int]("lo") >= 0 && c.getAs[Int]("hi") < 16, c.toString)
    assert(c.getAs[Int]("w0") == 8 && c.getAs[Int]("w1") == 8, c.toString)
  }

  test("ADC search recovers most of the exact top-5 through the 32x-compressed codes") {
    val got = SparkEntry
      .queries("pq_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view
      .mapValues(_.map(_.getAs[Long]("cand_id")).toSet)
      .toMap
    val exact = SparkEntry
      .queries("cosine_topk")(spark, sfDir)
      .filter(col("rank") <= 5)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view
      .mapValues(_.map(_.getAs[Long]("cid")).toSet)
      .toMap
    val recalls = exact.map { case (q, ex) => got.getOrElse(q, Set.empty).count(ex).toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(f"pq mean recall@5 vs exact (8x16 codebook, rescore=100): $mean%.3f at $sfDir")
    // the fixture vectors are near-isotropic — PQ's worst case (no
    // manifold for the codebook to exploit), so the floor is loose; the
    // deep rescore (100 of 500) is what holds it up
    assert(mean >= 0.5, s"mean recall@5 $mean too low for the ADC path")
  }

  test("IVF-PQ is probe-bound: recall vs the full-precision same-probe search stays high") {
    val got = SparkEntry
      .queries("ivf_pq_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view
      .mapValues(_.map(_.getAs[Long]("cand_id")).toSet)
      .toMap
    // ivf_ann searches the SAME nprobe=2 cells at full precision — the
    // deep ADC rescore (50 of ~nprobe/K corpus) must recover almost all
    // of its result despite 32x-compressed coarse scoring
    val fullPrec = SparkEntry
      .queries("ivf_ann")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view
      .mapValues(_.map(_.getAs[Long]("cand_id")).toSet)
      .toMap
    val vsFull = fullPrec.map { case (q, fp) =>
      got.getOrElse(q, Set.empty).count(fp).toDouble / fp.size
    }
    val mean = vsFull.sum / vsFull.size
    info(f"ivf-pq mean recall@5 vs full-precision same-probe: $mean%.3f at $sfDir")
    assert(mean >= 0.8, s"PQ tier lost $mean of the full-precision probe result")
  }

  test("pq_recall: valid per-query rows, useful mean on the worst-case fixture") {
    val rows = SparkEntry.queries("pq_recall")(spark, sfDir).collect()
    assert(rows.length == 8, "one row per sampled query")
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == 5L)
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0L && hit <= 5L)
      assert(r.getAs[Double]("recall") == math.floor(hit / 5.0 * 10000.0 + 0.5) / 10000.0 ||
        r.getAs[Double]("recall") == hit / 5.0)
    }
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    info(f"flat-PQ mean recall@5 vs exact: $mean%.3f at $sfDir")
    // near-isotropic vectors are PQ's worst case; the deep Rescore must
    // still hold a usable floor
    assert(mean >= 0.5, s"flat PQ recall collapsed: $mean")
  }
}
