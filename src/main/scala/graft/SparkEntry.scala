package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every declared operator module (SURVEY.md §2.12);
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash compare.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] =
    Seq(RelationalOps, WindowOps, ScalarOps, ExplodeOps, TextOps, DedupOps,
      SimilarityOps, PlanOps, MultimodalOps, PipelineOps, TemporalOps,
      AggregatorOps, SourceOps, ScalePatterns, Ivf, QuantizeOps, RetrievalOps,
      PqOps, BpeOps, CurationOps, KMeansOps)

  private val declared: Seq[DeclaredQuery] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary-style aggregation (scan → filter → hash agg → sort):
    * exercises pushdown, partial/final agg, and whole-stage codegen.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables
      .lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
