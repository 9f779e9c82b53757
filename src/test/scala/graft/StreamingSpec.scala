package graft

import java.nio.file.Files
import graft.streaming.EventStream

/** Streaming/batch parity: the AvailableNow streaming run over the same
  * parquet files must produce exactly the DuckDB-verified batch result of
  * time_bucket_agg, and watermarked dedup must be a no-op on unique ids.
  */
class StreamingSpec extends SparkSpec {

  /** File stream sources read directories; stage the single-file testdata
    * parquet into one (production events land as a directory of files).
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-000.parquet"),
    )
    dir.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory(s"ck-$name").toString)
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive)
  }

  test("streaming hourly agg equals the batch time_bucket_agg oracle query") {
    val stream = EventStream.readEvents(spark, eventsDir)
    runToMemory(EventStream.hourlyAgg(stream), "hourly")
    val streamed = spark
      .table("hourly")
      .orderBy("hour")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = SparkEntry
      .queries("time_bucket_agg")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming windowed counts + sink-side rank equal the batch heavy-hitters") {
    import org.apache.spark.sql.functions._
    val stream = EventStream.readEvents(spark, eventsDir)
    runToMemory(EventStream.typeCountsWindowed(stream), "type_counts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("hour")
      .orderBy(col("n").desc, col("event_type"))
    val streamed = spark
      .table("type_counts")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("hour", "rk")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val batch = Tables
      .events(spark, sfDir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("hour", "rk")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("watermarked dedup preserves unique event_ids") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val deduped = EventStream.dedupedEvents(stream).groupBy().count()
    runToMemory(deduped, "deduped_count")
    val n = spark.table("deduped_count").collect().head.getLong(0)
    val expected = Tables.events(spark, sfDir).count()
    assert(n == expected)
  }

  test("streaming sessionize parity with the batch sessionize oracle query") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val stream = EventStream
      .readEvents(spark, eventsDir)
      .select(col("user_id"), col("ts"))
      .as[EventStream.SessionEvent]
    val sess = EventStream.sessionize(stream, java.time.Duration.ofHours(4))
    val q = sess.writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ck-sess").toString)
      .start()
    q.awaitTermination(120000)
    // streaming state keeps ms precision; batch keeps µs — compare at ms
    val streamed = spark
      .table("sessions")
      .collect()
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime,
          r.getAs[Int]("n_events").toLong,
        ),
      )
      .toSet
    val batchRows = SparkEntry.queries("sessionize")(spark, sfDir).collect()
    val batch = batchRows
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[Long]("start_us") / 1000,
          r.getAs[Long]("end_us") / 1000,
          r.getAs[Long]("n_events"),
        ),
      )
      .toSet
    assert(streamed.subsetOf(batch), "every closed streaming session must be a batch session")
    // a user's final session may remain open (unemitted) at stream end
    val nUsers = batchRows.map(_.getAs[Long]("user_id")).distinct.length
    assert(
      streamed.size >= batch.size - nUsers,
      s"at most one open session per user may be withheld: ${streamed.size} vs ${batch.size} - $nUsers",
    )
  }

  test("watermarked hourly agg is a valid streaming plan") {
    val stream = EventStream.readEvents(spark, eventsDir)
    // analysis-time validation: watermark + window agg resolves in append mode
    val q = EventStream
      .hourlyAggWatermarked(stream)
      .writeStream
      .format("memory")
      .queryName("hourly_wm")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ck-wm").toString)
      .start()
    q.awaitTermination(120000)
    // append mode withholds the last open window; everything emitted must
    // match the batch result for its hour.
    val batch = SparkEntry
      .queries("time_bucket_agg")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val emitted = spark.table("hourly_wm").collect()
    assert(emitted.forall { r =>
      batch.get(r.getString(0)).contains((r.getLong(1), r.getDouble(2)))
    })
  }
}
