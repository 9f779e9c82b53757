package graft

import org.apache.spark.sql.functions._

/** Round-16 pins: the floor epoch-day spelling (calendar-day semantics
  * for pre-1970 timestamps, stated identically in both engines), the
  * gap_burstiness loud-overflow guard, and the simhash_bit_balance
  * defined-empty-corpus result — the three ADVICE items — plus the
  * BIGINT-output discipline on the re-greened wide-tier queries.
  */
class Round16OpsSpec extends SparkSpec {

  test("epoch-day grain FLOORS for pre-1970 timestamps (calendar-day semantics)") {
    // Bare DIV truncates toward zero: -1 µs would land on day 0 instead
    // of day -1 and its dow would shift — latent on post-epoch testdata,
    // divergent the moment a corpus carries pre-1970 rows.
    val ev = spark
      .createDataFrame(Seq(
        (1L, "a", -1L), // 1969-12-31 23:59:59.999999 → day -1
        (2L, "a", -86400000000L), // exactly -1 day → day -1
        (3L, "a", -86400000001L), // one µs earlier → day -2
        (4L, "a", 0L), // epoch → day 0
        (5L, "a", 86399999999L), // last µs of day 0 → day 0
        (6L, "a", 86400000000L), // first µs of day 1 → day 1
      ))
      .toDF("event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val days = operators.TemporalOps
      .typeDayCounts(ev)
      .select("day_no")
      .collect()
      .map(_.getLong(0))
      .toSeq
      .sorted
    assert(days == Seq(-2L, -1L, 0L, 1L),
      s"day_no must floor (got $days) — the calendar-day convention both engines now state")
  }

  test("gap_burstiness raises LOUDLY on DECIMAL(38,0) overflow instead of mis-bucketing") {
    // Past the ~6e6-gaps/user census bound the wide products overflow to
    // NULL under non-ANSI decimal semantics; a bare bucket CASE would
    // silently file the user under ELSE 'extreme' while DuckDB's
    // HUGEINT errors. The guard makes both engines fail the same way.
    // sg = 9e18 (near Long max): n·(n−1)·sg² ≈ 1.6e39 > 10³⁸ overflows.
    val moments = spark
      .createDataFrame(Seq((1L, 5L, 9000000000000000000L, 1.0)))
      .toDF("user_id", "n", "sg", "sgg_d")
      .withColumn("sgg", col("sgg_d").cast("decimal(38,0)"))
      .drop("sgg_d")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // Under ANSI (the Spark 4 default, and every graft session) the
    // decimal product itself errors — already loud.
    val ansi = intercept[Exception] {
      operators.TemporalOps.burstinessTail(moments).collect()
    }
    assert(messages(ansi).exists(m =>
      m.contains("NUMERIC_VALUE_OUT_OF_RANGE") || m.contains("overflow")),
      s"expected a loud ANSI overflow, got: $ansi")
    // With ANSI off the product silently NULLs — the raise_error guard
    // is what keeps the failure loud instead of mis-bucketing 'extreme'.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val quiet = intercept[Exception] {
        operators.TemporalOps.burstinessTail(moments).collect()
      }
      assert(messages(quiet).exists(_.contains("gap_burstiness: DECIMAL(38,0) overflow")),
        s"expected the raise_error guard under non-ANSI, got: $quiet")
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    // and in range the guard is inert: a small-moment user buckets normally
    val ok = spark
      .createDataFrame(Seq((1L, 5L, 50L, 1.0)))
      .toDF("user_id", "n", "sg", "sgg_d")
      .withColumn("sgg", lit(700L).cast("decimal(38,0)"))
      .drop("sgg_d")
    assert(operators.TemporalOps.burstinessTail(ok).count() == 1)
  }

  test("simhash_bit_balance returns the defined 0-row result on an empty corpus") {
    // A GLOBAL agg still emits one row (count 0, NULL sums) which would
    // stack into 30 NULL rows; the oracle's CROSS JOIN against an empty
    // sig set returns 0 rows. The n_docs > 0 guard restores parity.
    val dir = java.nio.file.Files.createTempDirectory("empty-docs").toString
    Tables
      .documents(spark, sfDir)
      .limit(0)
      .write
      .parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("simhash_bit_balance")(spark, dir).count() == 0L,
      "empty corpus must produce the oracle's 0-row frame, not 30 NULL rows")
  }

  test("mase_ses level series at k = K equals the declared exp_smooth_forecast level") {
    // The series and the single-level query share the per-term flooring
    // discipline; the last series element must BE the declared level —
    // the invariant that keeps the MASE numerator and the SES alert
    // level reading the same forecast.
    val grain = operators.TemporalOps.typeDayCounts(Tables.events(spark, sfDir))
    val idx = operators.TemporalOps.indexedDays(grain)
    val lastLevel = operators.TemporalOps
      .sesLevelSeries(idx)
      .join(
        idx.groupBy("event_type").agg(max(col("k")).as("kj")),
        Seq("event_type", "kj"),
      )
      .select("event_type", "level_e6")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val declared = SparkEntry.queries("exp_smooth_forecast")(spark, sfDir)
      .select("event_type", "level_e6")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(lastLevel == declared && declared.nonEmpty,
      "series tail must equal the declared SES level per feed")
  }

  test("holt_forecast trend is the geometric unroll of the β-recurrence over level diffs") {
    // The declared trend floors each unrolled term; the serial
    // recurrence T_j = 0.2·ΔL_j + 0.8·T_{j−1} in exact doubles must
    // agree within the accumulated per-term floor slack (≤ 0.5/day in
    // e6 units), and forecast must be the level+trend identity.
    val grain = operators.TemporalOps.typeDayCounts(Tables.events(spark, sfDir))
    val idx = operators.TemporalOps.indexedDays(grain)
    val series = operators.TemporalOps
      .sesLevelSeries(idx)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.sortBy(_._2).map(_._3).toSeq }
    val declared = SparkEntry.queries("holt_forecast")(spark, sfDir).collect()
    assert(declared.nonEmpty)
    declared.foreach { r =>
      val (t, nDays, level, trend, fc) =
        (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(fc == level + trend, s"$t: forecast must be level + trend")
      val ls = series(t)
      assert(ls.length.toLong == nDays && ls.last == level,
        s"$t: declared level must be the series tail")
      val serial = ls.sliding(2).foldLeft(0.0) { case (tr, Seq(a, b)) =>
        0.2 * (b - a) + 0.8 * tr
      }
      assert(math.abs(serial - trend) <= 0.5 * nDays + 1,
        s"$t: unrolled trend $trend vs serial $serial beyond floor slack")
    }
  }

  test("knn_graph_scaled edges stay within their derived IVF cell, ranked and complete") {
    import org.apache.spark.sql.expressions.Window
    // The scale-safe twin's whole contract: candidates are cell-mates
    // (that is what bounds pair work to Σ n_c²), ranks are the exact
    // within-cell cosine order, and every source emits min(3, m−1)
    // edges for a cell of size m — no neighbor silently dropped.
    val edges = SparkEntry.queries("knn_graph_scaled")(spark, sfDir)
    val n = Tables.embeddings(spark, sfDir).count()
    val asg = operators.Ivf
      .cellAssignment(spark, sfDir, operators.SimilarityOps.derivedCellCount(n))
    val withCells = edges
      .join(asg.select(col("vec_id").as("src"), col("cid").as("scid")), Seq("src"))
      .join(asg.select(col("vec_id").as("nbr"), col("cid").as("ncid")), Seq("nbr"))
    assert(withCells.filter(col("scid") =!= col("ncid")).count() == 0,
      "every edge must connect cell-mates")
    val cellSize = asg.groupBy("cid").count().select(col("cid").as("scid"), col("count"))
    val perSrc = withCells
      .groupBy("src", "scid")
      .agg(count(lit(1)).as("deg"), max("rank").as("maxr"), min("rank").as("minr"))
      .join(cellSize, Seq("scid"))
    assert(perSrc.filter(col("deg") =!= least(lit(3L), col("count") - 1)).count() == 0,
      "each source must emit min(3, cellsize − 1) edges")
    assert(perSrc.filter(col("minr") =!= 1L || col("maxr") =!= col("deg")).count() == 0,
      "ranks must be contiguous from 1")
    val disordered = edges
      .withColumn(
        "prev_sim",
        lag(col("sim"), 1).over(Window.partitionBy("src").orderBy("rank")),
      )
      .filter(col("prev_sim").isNotNull && col("sim") > col("prev_sim"))
    assert(disordered.count() == 0, "sim must be non-increasing in rank per source")
  }

  test("re-greened wide-tier queries declare BIGINT outputs (wide stays internal)") {
    // The round-15 driver-gate regression: 8 queries let DECIMAL(38,0)
    // accumulators leak into the declared output schema. Values were
    // bit-identical; the byte-hash was not. Pin each output column back
    // to LongType — the DeclarationLintSpec whitelist enforces the
    // global rule; this names the 8 regressed columns directly.
    import org.apache.spark.sql.types.LongType
    val pins = Seq(
      "kmeans_cost" -> "sse",
      "kmeans_elbow" -> "sse",
      "kmeans_seed_quality" -> "sse",
      "embedding_dim_stats" -> "s2",
      "embedding_covariance" -> "si",
      "embedding_covariance" -> "sj",
      "embedding_covariance" -> "sij",
      "events_checksum" -> "checksum_sum",
      "table_checksum" -> "checksum_sum",
      "session_stats" -> "sum_duration_us",
    )
    pins.foreach { case (q, c) =>
      val f = SparkEntry.queries(q)(spark, sfDir).schema(c)
      assert(f.dataType == LongType, s"$q.$c must declare BIGINT, got ${f.dataType}")
    }
  }
}
