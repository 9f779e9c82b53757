package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10): the streaming twin of
  * the `time_bucket_agg` batch query, plus watermarked stateful dedup.
  *
  * The reference is batch-only (OneFS *emits* inotify event streams but
  * IHT just reads the knobs, onefs.py:1099-1120); the north star asks for
  * stream processing over the `events` table. Design: one shared
  * aggregation applied to either a batch or a streaming DataFrame, so the
  * batch oracle (DuckDB-verified) also certifies the streaming plan's
  * semantics — parity is asserted in StreamingSpec via an AvailableNow
  * run over the same files.
  *
  * Scale notes: the hourly window agg is a streaming hash aggregation
  * keyed by (window start) — state is bounded by (#open windows ×
  * #partitions); the 10-minute watermark bounds open windows. Dedup keeps
  * one (event_id) per watermark horizon — state bounded by arrival skew,
  * not stream length.
  */
object EventStream {

  /** Physical schema of the events parquet with ns-as-long timestamps
    * (TESTDATA.md: events.ts is TIMESTAMP(NANOS); Spark 4 reads it as long
    * under spark.sql.legacy.parquet.nanosAsLong).
    */
  val rawSchema: StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // nanos since epoch
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType),
    ),
  )

  /** Streaming read of an events parquet directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The shared hourly aggregation — applied identically to batch
    * (ExplodeOps.time_bucket_agg) and streaming inputs.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
      )
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n"),
        col("total_value"),
      )

  /** Watermarked variant for append-mode production runs: only closes a
    * window once events later than watermark have passed.
    */
  def hourlyAggWatermarked(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "10 minutes"))

  /** Stateful exact dedup on event_id within the watermark horizon
    * (the streaming analog of A1 distinct-set dedup).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark("event_id")
}
