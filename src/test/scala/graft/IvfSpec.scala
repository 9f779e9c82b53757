package graft

import org.apache.spark.sql.functions._
import graft.operators.Ivf

/** IVF index invariants: full partition coverage, deterministic builds,
  * and useful recall against the exact brute-force top-k.
  */
class IvfSpec extends SparkSpec {

  private lazy val e = Tables
    .embeddings(spark, sfDir)
    .withColumn("dvec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    .select("vec_id", "dvec")

  test("every vector lands in exactly one of k cells; build is deterministic") {
    val cents = Ivf.buildCentroids(spark, e, k = 16, iters = 2)
    assert(cents.count() <= 16 && cents.count() > 1)
    val assigned = Ivf.assign(spark, e, cents)
    assert(assigned.count() == e.count())
    assert(assigned.select("vec_id").distinct().count() == e.count())
    val again = Ivf.assign(spark, e, Ivf.buildCentroids(spark, e, k = 16, iters = 2))
    assert(
      assigned.select("vec_id", "cid").except(again.select("vec_id", "cid")).count() == 0,
      "same seeds + same data must give the same index",
    )
  }

  test("cell-partitioned layout: probe prunes to nprobe directories, same answer") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-cells").toString
    val cents = Ivf.buildCentroids(spark, e, k = 16, iters = 2)
    Ivf.writeCellLayout(spark, e, cents, dir)
    // one directory per live cell
    val cellDirs = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir))
      .iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var nDirs = 0
    cellDirs.forEachRemaining(p => if (p.getFileName.toString.startsWith("cid=")) nDirs += 1)
    assert(nDirs > 1 && nDirs <= 16, s"expected per-cell directories, got $nDirs")

    val queries = e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("dvec").as("qvec"))
    val bucketed = Ivf.searchCellLayout(spark, dir, cents, queries, nprobe = 3, topk = 10)
    // the scan must prune on the partition column at planning time
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(
      plan.contains("PartitionFilters") && plan.contains("cid"),
      s"probe must prune cell directories:\n${plan.take(1000)}",
    )
    val inMem = Ivf.searchTopK(spark, e, cents, queries, nprobe = 3, topk = 10)
    assert(
      bucketed.collect().toSeq == inMem.collect().toSeq,
      "cell-layout probe must return exactly the in-memory probe's answer",
    )
  }

  test("nprobe search recalls most of the exact top-10") {
    val cents = Ivf.buildCentroids(spark, e, k = 16, iters = 2)
    val queries = e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("dvec").as("qvec"))
    val got = Ivf
      .searchTopK(spark, e, cents, queries, nprobe = 6, topk = 10)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view
      .mapValues(_.map(_.getAs[Long]("cid")).toSet)
      .toMap
    val exact = SparkEntry
      .queries("cosine_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view
      .mapValues(_.map(_.getAs[Long]("cid")).toSet)
      .toMap
    val recalls = exact.map { case (q, ex) => got.getOrElse(q, Set.empty).count(ex).toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(f"ivf mean recall@10 (k=16, iters=2, nprobe=6): $mean%.3f at $sfDir")
    // random 64-dim vectors are a worst case for IVF; probing 6/16 cells
    // must still recover a solid share of the true neighbors
    assert(mean >= 0.35, s"mean recall@10 $mean too low")
    assert(recalls.forall(_ > 0.0), "every query must recall at least one true neighbor")
  }
}
