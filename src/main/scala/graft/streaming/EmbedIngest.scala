package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Ivf

/** Continuous maintenance of the durable IVF cell layout — the ANN
  * counterpart of `EventStream.writePartitionedByDay`: new embedding
  * batches land on a file stream, each batch is assigned to its nearest
  * cell under the STANDING centroid table (read-only — batches are
  * embarrassingly independent, the assignment is a per-row argmax
  * against a broadcast k-row table), and the rows append to the
  * `partitionBy(cid)` layout that `Ivf.searchCellLayout` prunes at
  * planning time. The index is built BY ingest, not by nightly
  * rebuilds; centroid refresh (re-running Lloyd when drift accumulates)
  * stays a batch concern, exactly as in production IVF serving.
  *
  * CRASH-REPLAY IDEMPOTENCE: each batch writes under its own `b=<id>`
  * partition with dynamic partition overwrite, so a replayed batch
  * rewrites its own partitions and never duplicates rows. `cid` stays a
  * partition column beneath `b`, so cell pruning still prunes
  * directories across every batch generation.
  *
  * Both this loop and the one-shot [[graft.operators.Ivf.writeCellLayout]]
  * route through [[graft.operators.Ivf.assign]], so the assignment
  * definition cannot drift; StreamingSpec proves the streamed layout
  * serves identical search results to a one-shot build.
  */
object EmbedIngest {

  /** File-stream an embeddings table layout, one file per micro-batch. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Run the ingest loop until no files remain, appending each batch's
    * assigned vectors to the durable cell layout at `layoutDir`.
    * `centroids` is the standing (cid, cvec) table.
    *
    * LIFETIME CONTRACT: `checkpointDir` and `layoutDir` are coupled for
    * the layout's whole life. Idempotence rests on the dynamic partition
    * overwrite being keyed by `b=<batchId>`, and batch ids are assigned
    * by the CHECKPOINT — a restart against the same checkpoint replays
    * the same ids onto the same partitions (safe), but starting a FRESH
    * checkpoint over an existing layout restarts ids at 0 and silently
    * overwrites the earlier generation's `b=0,1,…` partitions, dropping
    * their vectors. To re-ingest from scratch, clear BOTH directories;
    * to resume, keep both. (StreamingSpec's recovery test exercises the
    * same-checkpoint replay path.)
    */
  def startCellAppend(
      embeds: DataFrame,
      centroids: DataFrame,
      layoutDir: String,
      checkpointDir: String,
  ): StreamingQuery = {
    val spark = embeds.sparkSession
    embeds.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val e = batch.select(
          col("vec_id"),
          expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("dvec"),
        )
        Ivf
          .assign(spark, e, centroids)
          .select("vec_id", "cid")
          .join(e, "vec_id")
          .select(lit(batchId).as("b"), col("cid"), col("vec_id"), col("dvec"))
          .write
          .option("partitionOverwriteMode", "dynamic")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("b", "cid")
          .parquet(layoutDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
