package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets native
  * column pruning + predicate pushdown into the parquet scans. At 100 TB
  * the same call works against a partitioned directory tree; nothing here
  * assumes single-file layout.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts normalization. The driver testdata has shipped two physical
    * encodings across rounds: TIMESTAMP(NANOS) (Spark 4 rejects it outright
    * with PARQUET_TYPE_ILLEGAL, so it is read nanos-as-long and truncated to
    * µs — the truncation DuckDB applies scanning NANOS into its µs
    * TIMESTAMP) and TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4
    * infers as TIMESTAMP_NTZ. Every downstream operator (unix_micros,
    * LTZ-literal comparisons) wants plain TIMESTAMP, so both encodings are
    * normalized here, at the single load point. Under the UTC session
    * timezone all entry points set, NTZ→LTZ is a pure reinterpretation of
    * the same epoch micros DuckDB's epoch_us(ts) reads — oracle agreement
    * is exact either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
