package graft

import org.apache.spark.sql.functions._

/** Round-17 pins: the six banded-kNN consumers' production twins and the
  * cell-bounded DBSCAN — the round-16 verdict's re-basing items. The
  * hash gate proves each twin equals its own oracle; these pins prove the
  * RELATIONSHIPS the twin story rests on: byte-shared metric tails
  * (schema equality with the banded declared forms), min-id CC labeling
  * invariants, and the subset/monotonicity facts of the cell-restricted
  * ε-graph (scaled pair space ⊆ exact pair space).
  */
class Round17OpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("every scaled kNN twin carries its banded counterpart's exact schema") {
    // The twin contract: SAME metric, swapped substrate. A schema drift
    // here means the tails stopped being shared.
    for (
      base <- Seq(
        "knn_components", "knn_label_agreement", "hubness_stats",
        "knn_cluster_purity", "label_propagation", "knn_modularity",
        "dbscan_clusters",
      )
    ) {
      val b = run(base).schema
      val t = run(s"${base}_scaled").schema
      assert(b == t, s"$base vs ${base}_scaled schema drift: $b != $t")
    }
  }

  test("knn_components_scaled labels are min-id component labels") {
    val cc = run("knn_components_scaled").collect().map(r => (r.getLong(0), r.getLong(1)))
    // every label ≤ its member (min-id convention) …
    assert(cc.forall { case (v, l) => l <= v })
    // … and every label IS a member of its own cluster (the canonical row)
    val byLabel = cc.groupBy(_._2)
    assert(byLabel.forall { case (l, members) => members.exists(_._1 == l) })
    // total: one label per corpus vector
    val n = Tables.embeddings(spark, sfDir).count()
    assert(cc.length == n)
  }

  test("dbscan_clusters_scaled: cell restriction only REMOVES ε-pairs (degree ≤ exact)") {
    // The declared semantics is the cell-restricted ε-graph: a pair
    // straddling a cell boundary does not edge. So per vector the scaled
    // degree can never exceed the exact tier's, and no scaled core can be
    // exact-noise with a higher degree. This is the boundary-effect
    // statement made checkable.
    val exact = run("dbscan_clusters")
      .select(col("vec_id"), col("degree").as("d_exact"))
    val scaled = run("dbscan_clusters_scaled")
      .select(col("vec_id"), col("degree").as("d_scaled"))
    val bad = exact
      .join(scaled, Seq("vec_id"))
      .filter(col("d_scaled") > col("d_exact"))
      .count()
    assert(bad == 0L, s"$bad vectors gained ε-neighbors under cell restriction")
  }

  test("dbscan_clusters_scaled role/degree invariants (core ≥ minPts > noise-with-label)") {
    val out = run("dbscan_clusters_scaled").collect()
    out.foreach { r =>
      val role = r.getString(1)
      val cluster = r.getLong(2)
      val degree = r.getLong(3)
      role match {
        case "core" =>
          assert(degree >= 4L, s"core ${r.getLong(0)} has degree $degree < minPts")
          assert(cluster >= 0L)
        case "border" => assert(cluster >= 0L)
        case "noise" => assert(cluster == -1L)
        case other => fail(s"unknown role $other")
      }
    }
  }

  test("perplexityBucketScaled: bit-identical to the declared ntile form, no global window") {
    // The production path must reproduce ntile(3)'s EXACT assignment —
    // including the tie split inside a boundary surprisal value — while
    // keeping every window partitioned (the declared form's global
    // total-order window is the one single-partition stage in the text
    // family).
    val declared = run("perplexity_bucket")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val scaledDf = operators.TextOps.perplexityBucketScaled(spark, sfDir)
    val scaled = scaledDf
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(scaled.toSeq == declared.toSeq)
    // structural pin: no WindowExec with an empty partition spec anywhere
    // (including under AQE re-optimization)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(p: SparkPlan): Seq[WindowExec] =
      p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w } ++
        p.collect { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => globalWindows(a.executedPlan))
    assert(globalWindows(scaledDf.queryExecution.executedPlan).isEmpty,
      "scaled path must not contain a global (unpartitioned) window")
    // sanity: the declared form DOES have one — the pin would be vacuous
    // if the detector never fired
    val dec = SparkEntry.queries("perplexity_bucket")(spark, sfDir)
    assert(globalWindows(dec.queryExecution.executedPlan).nonEmpty)
  }

  test("DECIMAL DIV truncates toward zero at BOTH signs (acf_lag7's num can be negative)") {
    // acf_lag7 is the first declared query whose wide-integer quotient
    // numerator can be NEGATIVE (anticorrelated series). Spark's
    // IntegralDivide and DuckDB's HUGEINT `//` both truncate toward
    // zero (-7 // 2 = -3, verified in DuckDB); this pins the Spark half
    // so the cross-engine claim in the docstring stays checked.
    val r = spark
      .range(1)
      .selectExpr(
        "CAST(CAST(-7 AS DECIMAL(38,0)) DIV 2 AS BIGINT) AS a",
        "CAST(CAST(-1000001 AS DECIMAL(38,0)) DIV 3 AS BIGINT) AS b",
      )
      .collect()(0)
    assert(r.getLong(0) == -3L, s"DECIMAL DIV must truncate toward zero, got ${r.getLong(0)}")
    assert(r.getLong(1) == -333333L)
  }

  test("acf_lag7: r7 is a valid correlation and short spans are NULL") {
    val out = run("acf_lag7").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (!r.isNullAt(3)) {
        val r7 = r.getLong(3)
        assert(r7 >= -1000000L && r7 <= 1000000L,
          s"r7_e6 out of [-1e6, 1e6] for ${r.getString(0)}: $r7")
      }
    }
    // a 3-day span has no lag-7 pair: the statistic must be NULL, not 0
    val tiny = spark
      .createDataFrame(Seq(("a", 0L, 5L), ("a", 1L, 7L), ("a", 2L, 6L)))
      .toDF("event_type", "day_no", "c")
    val short = operators.TemporalOps.acfLag7From(tiny).collect()(0)
    assert(short.isNullAt(3), "span shorter than the lag must yield NULL r7")
    // a perfectly 7-periodic dense series reads the estimator's exact
    // ceiling (n-k)/n — the standard BIASED ACF normalizes the n-k
    // cross terms by the full-n variance, so 28 days at lag 7 give
    // 21/28 = 0.75 exactly (and an anti-phase check would go negative)
    val periodic = spark
      .createDataFrame((0L until 28L).map(d => ("p", d, (d % 7) + 1)))
      .toDF("event_type", "day_no", "c")
    val per = operators.TemporalOps.acfLag7From(periodic).collect()(0)
    assert(per.getLong(3) == 750000L, s"7-periodic 28-day series must read (n-k)/n = 0.75, got $per")
    // 7-antiperiodic (period-14 sign flip): the lag-7 correlation is
    // NEGATIVE — exercises the truncate-toward-zero path on a negative
    // numerator end-to-end
    val anti = spark
      .createDataFrame((0L until 28L).map(d => ("q", d, if ((d / 7) % 2 == 0) 10L else 0L)))
      .toDF("event_type", "day_no", "c")
    val an = operators.TemporalOps.acfLag7From(anti).collect()(0)
    assert(an.getLong(3) < 0L, s"anti-phase series must read negative r7, got $an")
  }

  test("intrinsic_dim: one exact row, estimator positive, duplicates excluded") {
    val out = run("intrinsic_dim").collect()
    assert(out.length == 1)
    val (nUsed, sum, dim) = (out(0).getLong(0), out(0).getLong(1), out(0).getLong(2))
    assert(nUsed > 0L && sum > 0L, s"fixture must yield usable 2-NN ratios ($nUsed, $sum)")
    assert(dim > 0L, s"dimension estimate must be positive, got $dim")
    // the ambient dim is 64: the intrinsic estimate must not exceed it
    // by more than rounding slack (it measures the manifold, not noise)
    assert(dim <= 64000L, s"TwoNN estimate ${dim / 1000.0} exceeds the ambient 64 dims")
  }

  test("knn_assortativity: bounded correlation, exact on a hand graph") {
    val out = run("knn_assortativity").collect()
    assert(out.length == 1)
    if (!out(0).isNullAt(1)) {
      val r = out(0).getLong(1)
      assert(r >= -1000000L && r <= 1000000L, s"r_e6 out of [-1e6, 1e6]: $r")
    }
    // hand check of the moment algebra on the 3-edge path a-b-c-d
    // (degrees 1,2,2,1) — see the exact-integer derivation at the
    // assertion below
    import spark.implicits._
    val ue = Seq((1L, 1L, 2L), (2L, 2L, 3L), (3L, 3L, 4L))
      .toDF("id", "src", "nbr")
      .withColumn("rank", col("id"))
      .withColumn("sim", lit(0.5))
    // feed through the same algebra inline (the query's substrate is
    // corpus-bound, so replicate the tail on the toy edge list)
    val e = ue.select(least(col("src"), col("nbr")).as("a"), greatest(col("src"), col("nbr")).as("b")).distinct()
    val deg = e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val dir = e.select(col("a").as("u"), col("b").as("w"))
      .unionByName(e.select(col("b").as("u"), col("a").as("w")))
      .join(deg.select(col("v").as("u"), col("deg").as("x")), Seq("u"))
      .join(deg.select(col("v").as("w"), col("deg").as("y")), Seq("w"))
    val g = dir.agg(
      count(lit(1)).as("m2"), sum("x").as("sx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
    ).selectExpr(
      """CAST(((CAST(m2 AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000)
        | DIV nullif(CAST(m2 AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0)
        | AS BIGINT) AS r_e6""".stripMargin,
    ).collect()(0)
    // path a-b-c-d: M=6, Σx=10, Σxy=1·2+2·1+2·2+2·2+2·1+1·2=16,
    // Σx²=18 → num=6·16−100=−4, den=6·18−100=8 → r=−0.5 exactly
    // (mildly disassortative, as a path should be)
    assert(g.getLong(0) == -500000L, s"path-graph assortativity must be exactly -0.5, got $g")
  }

  test("scaled substrate serves the whole consumer family from one cache entry") {
    // knn_components_scaled + purity share the knn-cc-labels-scaled
    // substrate, and everything rides knn-edges-scaled: after running the
    // family, the session holds substrates only for this dataset.
    run("knn_components_scaled").collect()
    run("knn_cluster_purity_scaled").collect()
    run("hubness_stats_scaled").collect()
    assert(SubstrateCache.liveDatasets(spark).subsetOf(Set(sfDir)))
  }
}
