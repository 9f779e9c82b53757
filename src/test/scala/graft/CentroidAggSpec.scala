package graft

import org.apache.spark.sql.functions._
import graft.functions.CentroidAggregator

/** The typed Aggregator: correct centroids on a known fixture and
  * partitioning-invariant results (the point of integer-scaled sums).
  */
class CentroidAggSpec extends SparkSpec {

  test("reduce/merge compute exact element-wise sums and counts") {
    val z = CentroidAggregator.zero
    val b1 = CentroidAggregator.reduce(z, (0, Seq(1L, 2L, 3L)))
    val b2 = CentroidAggregator.reduce(b1, (0, Seq(10L, 20L, 30L)))
    val other = CentroidAggregator.reduce(CentroidAggregator.zero, (0, Seq(100L, 200L, 300L)))
    val m = CentroidAggregator.merge(b2, other)
    assert(m == (Seq(111L, 222L, 333L), 3L))
    // merging with an untouched (empty) partial buffer is the identity
    assert(CentroidAggregator.merge(m, CentroidAggregator.zero) == m)
    intercept[IllegalArgumentException] {
      CentroidAggregator.reduce(b2, (0, Seq(1L)))
    }
  }

  test("centroid_agg is invariant under repartitioning") {
    import spark.implicits._
    val base = Tables
      .embeddings(spark, sfDir)
      .select(
        col("label"),
        expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))")
          .as("sv"),
      )
    def run(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Seq[Long]] =
      df.as[(Int, Seq[Long])]
        .groupByKey(_._1)
        .agg(CentroidAggregator.toColumn.name("acc"))
        .collect()
        .map { case (label, (sums, n)) => (label, n) -> sums }
        .toMap
    val a = run(base.repartition(1))
    val b = run(base.repartition(17, col("label")))
    val c = run(base.repartition(32))
    assert(a == b && b == c, "integer-scaled sums must not depend on partitioning")
  }

  test("centroid values are exact means of the scaled fixture") {
    val rows = SparkEntry.queries("centroid_agg")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labels = rows.map(_.getAs[Int]("label")).distinct
    // n_vecs consistent per label, pos contiguous from 0
    labels.foreach { l =>
      val sub = rows.filter(_.getAs[Int]("label") == l).sortBy(_.getAs[Long]("pos"))
      assert(sub.map(_.getAs[Long]("n_vecs")).distinct.length == 1)
      assert(sub.map(_.getAs[Long]("pos")).toSeq == (0L until sub.length).toSeq)
      sub.foreach(r => assert(math.abs(r.getAs[Double]("c")) <= 10.0))
    }
  }
}
