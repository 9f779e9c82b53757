package graft

import org.apache.spark.sql.functions._

/** Hive-style partition layout + pruning — the 100 TB table-layout story
  * the single-file testdata can't show: a `partitionBy` write produces
  * one directory per key, and a key predicate must prune to those
  * directories AT PLANNING TIME (PartitionFilters in the scan, distinct
  * from PushedFilters which still reads every file's row groups).
  */
class PartitionPruningSpec extends SparkSpec {

  test("partitionBy write + key predicate prunes partitions in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("docs-by-lang").toString
    Tables
      .documents(spark, sfDir)
      .write
      .mode("overwrite")
      .partitionBy("lang")
      .parquet(dir)

    val langs = Tables
      .documents(spark, sfDir)
      .select("lang")
      .distinct()
      .collect()
      .map(_.getString(0))
    assert(langs.length > 1, "need multiple partitions for pruning to mean anything")

    val pruned = spark.read.parquet(dir).filter(col("lang") === langs.head)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(
      plan.contains("PartitionFilters") && plan.contains("lang"),
      s"lang predicate must prune at planning time:\n${plan.take(800)}",
    )
    // pruning must not change results
    val expected = Tables.documents(spark, sfDir).filter(col("lang") === langs.head).count()
    assert(pruned.count() == expected)

    // a non-partition predicate still reaches the scan as a pushed filter
    val byId = spark.read.parquet(dir).filter(col("doc_id") < 10)
    val planById = byId.queryExecution.executedPlan.toString
    assert(planById.contains("PushedFilters") && planById.contains("doc_id"), planById.take(800))
  }
}
