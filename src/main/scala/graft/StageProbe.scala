package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic stage profiler (guide §1.1): runs one declared query with a
  * listener and prints, per completed stage, the summed task wall time,
  * executor run/CPU time, shuffle bytes, spill, and task count — the
  * local-mode stand-in for the Spark UI stage page (the UI is disabled in
  * this sandbox). Substrates are warmed by an untimed pass first, exactly
  * like Bench's rep-0, so the probe sees the steady-state per-rep cost.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StageProbe <sfDir> name[,name] [reps]"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM warm like Bench
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm substrates + codegen
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Long, Long, Long, Int)]
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          rows += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
            m.memoryBytesSpilled, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      for (_ <- 1 to reps) fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $name%s: $reps reps, ${secs}%.3f s wall (${secs / reps}%.3f s/rep) =====")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"shR_kB"}%8s ${"shW_kB"}%8s ${"spill"}%8s ${"tasks"}%6s  name")
      rows.sortBy(-_._4).foreach { case (id, nm, wall, run, cpu, sr, sw, sp, nt) =>
        println(f"$id%6d $wall%8d $run%8d $cpu%8d ${sr / 1024}%8d ${sw / 1024}%8d $sp%8d $nt%6d  $nm")
      }
      val nStages = rows.size
      val sumRun = rows.map(_._4).sum
      println(f"stages=$nStages sum(run_ms)=$sumRun")
    }
    spark.stop()
  }
}
