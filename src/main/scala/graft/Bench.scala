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
    // Default 3 reps, min taken, INTERLEAVED: the whole suite runs
    // rep-by-rep (pass 1 of every query, then pass 2, ...) instead of
    // back-to-back reps per query, so a transient external-load spike —
    // this box shows occasional 50%+ ones — cannot own every rep of one
    // query; minutes apart, the min sees at least one quiet pass.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val suite = SparkEntry.queries.toSeq
      .sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to reps; (name, fn) <- suite) {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val secs = (System.nanoTime() - t0) / 1e9
      // a failed rep aborts early — its elapsed time is not a
      // measurement and must not win the min
      if (ok) best.updateWith(name)(p => Some(p.fold(secs)(math.min(_, secs))))
    }
    // -1 marks an all-reps-failed query (NaN would break JSON parsing)
    val results = suite.map { case (name, _) => name -> best.getOrElse(name, -1.0) }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
