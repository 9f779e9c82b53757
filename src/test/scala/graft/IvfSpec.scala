package graft

import org.apache.spark.sql.functions._
import graft.operators.Ivf

/** IVF index invariants: full partition coverage, deterministic builds,
  * and useful recall against the exact brute-force top-k.
  */
class IvfSpec extends SparkSpec {

  test("SQ8-inside-IVF recovers most of the exact top-5 through both lossy tiers") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry
      .queries("ivf_quantized_topk")(spark, sfDir)
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
    info(f"ivf+sq8 mean recall@5 vs exact (k=8, nprobe=2, rescore=20): $mean%.3f at $sfDir")
    // two lossy tiers compound: the cell probe bounds recall (nprobe=2 of
    // 8 cells) and SQ8 only reorders within it — vs-exact recall is the
    // probe's number, so the floor here is loose
    assert(mean >= 0.4, s"mean recall@5 $mean too low for the quantized IVF path")
    // isolate the SQ8 tier: against the full-precision search of the SAME
    // probed cells (ivf_ann), the 4x rescore buffer must recover nearly
    // every neighbor — quantization may not add meaningful loss
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
    val meanVsFull = vsFull.sum / vsFull.size
    info(f"ivf+sq8 mean recall@5 vs full-precision same-probe: $meanVsFull%.3f at $sfDir")
    assert(meanVsFull >= 0.9, s"SQ8 tier lost $meanVsFull of the full-precision probe result")
  }

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
