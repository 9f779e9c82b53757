package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (classloading, codegen infrastructure, parquet reader)
    // so the alphabetically-first query doesn't absorb ~5s of one-time
    // cost into its number.
    val warmDir = sfDir
    spark.read.parquet(s"$warmDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    // noop sink forces full materialization of every output column;
    // count() would let Catalyst prune the projections being measured.
    // SPARK_GRAFT_ONLY=a,b,c + SPARK_GRAFT_REPS=n for focused iteration.
    // Default 2 reps, min taken: this box shows occasional 50%+ transient
    // spikes (external load), and min-of-2 reports the query's real cost
    // instead of whichever rep collided with a spike.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val results = SparkEntry.queries.toSeq
      .sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
