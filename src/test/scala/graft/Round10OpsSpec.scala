package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-10 declared queries: the Bloom
  * prefilter's superset/effectiveness contract, salted-join equivalence +
  * salt-in-exchange, sketch mergeability, lag-dedup ≡ exists-prior
  * equivalence, PMI recomputation, and a driver-side KS reference.
  */
class Round10OpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("bloom_prune_join: result equals the plain join; prefilter passes a superset") {
    val dimKeys = Tables
      .customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000.0)
      .select(col("c_custkey"))
    val plain = Tables
      .orders(spark, sfDir)
      .join(dimKeys, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"),
      )
      .orderBy("o_orderpriority")
      .collect()
      .toSeq
    assert(q("bloom_prune_join").collect().toSeq == plain)
  }

  test("bloom prefilter discards most non-matching fact rows (the 100 TB point)") {
    // Rebuild the probe side only (no exact residual): count survivors.
    val all = Tables.orders(spark, sfDir).count()
    val matched = Tables
      .orders(spark, sfDir)
      .join(
        Tables
          .customer(spark, sfDir)
          .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000.0)
          .select("c_custkey"),
        col("o_custkey") === col("c_custkey"),
      )
      .count()
    // The declared query's agg total = matched rows; the filter's value is
    // matched ≪ all. With m=16 Kbit over ~60 keys the false-positive rate
    // is ~0 at fixture scale, so survivors ≈ matched.
    val survived = q("bloom_prune_join").agg(sum("n")).head.getLong(0)
    assert(survived == matched)
    assert(matched < all / 5, s"fixture lost selectivity: $matched of $all")
  }

  test("salted_join: equals the plain join; the exchange is keyed by (key, salt)") {
    val plain = Tables
      .events(spark, sfDir)
      .join(
        Tables.customer(spark, sfDir).select(col("c_custkey").as("user_id"), col("c_mktsegment")),
        Seq("user_id"),
      )
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
      )
      .orderBy("c_mktsegment")
      .collect()
      .toSeq
    val df = q("salted_join")
    assert(df.collect().toSeq == plain)
    val plan = df.queryExecution.executedPlan.toString
    assert(
      plan.contains("__salt"),
      s"salt column must reach the physical plan's exchange keys:\n$plan",
    )
  }

  test("sketch_union: the (all) row derives from merged sketches, not raw re-scan") {
    val rows = q("sketch_union").collect()
    val all = rows.find(_.getString(0) == "(all)").get
    val perType = rows.filter(_.getString(0) != "(all)")
    // merged occupied-bucket count is bounded by the union bound and by m
    assert(all.getLong(1) <= perType.map(_.getLong(1)).sum)
    assert(all.getLong(1) >= perType.map(_.getLong(1)).max)
    // estimator sanity on the fixture: within 5% of exact
    val est = all.getLong(2).toDouble
    val exact = all.getLong(3).toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"est $est vs exact $exact")
  }

  test("event_dedup_window: lag-dup is exists-prior-within-window; counts conserve") {
    val rows = q("event_dedup_window").collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
    // independent formulation: dup iff ANY earlier same-(user,type) event
    // sits within the window (equivalent to the lag predicate because the
    // immediate predecessor is the latest witness)
    val e = Tables
      .events(spark, sfDir)
      .withColumn("us", expr("unix_micros(ts)"))
      .select("user_id", "event_type", "us", "event_id")
    val a = e.toDF("u", "t", "us_a", "id_a")
    val b = e.toDF("u", "t", "us_b", "id_b")
    val dups = a
      .join(
        b,
        Seq("u", "t"),
      )
      .filter(
        (col("us_b") < col("us_a") || (col("us_b") === col("us_a") && col("id_b") < col("id_a")))
          && col("us_a") - col("us_b") < lit(60000000L),
      )
      .select("t", "id_a")
      .distinct()
      .groupBy(col("t").as("event_type"))
      .agg(count(lit(1)).as("n_dups_ref"))
    val declared = q("event_dedup_window").select("event_type", "n_dups")
    val mismatch = declared
      .join(dups, Seq("event_type"), "full")
      .filter(coalesce(col("n_dups"), lit(0L)) =!= coalesce(col("n_dups_ref"), lit(0L)))
      .count()
    assert(mismatch == 0)
  }

  test("cooccurrence_pmi: min-count holds and the top row's PMI recomputes") {
    val rows = q("cooccurrence_pmi").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 5))
    val top = rows.head
    val (c12, c1, c2) = (top.getLong(2), top.getLong(3), top.getLong(4))
    val n = Tables
      .documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .count() - Tables.documents(spark, sfDir).count() // Σ(len-1) = words - docs
    val pmi = math.log(c12.toDouble) + math.log(n.toDouble) -
      math.log(c1.toDouble) - math.log(c2.toDouble)
    assert(math.abs(top.getLong(5) - math.floor(pmi * 1e6 + 0.5)) <= 1)
  }

  test("zorder_scan: result equals the plain box query; scan lists only the box's cells") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val plain = Tables
      .events(spark, sfDir)
      .filter(
        col("user_id").between(4L, 35L) &&
          col("ts") >= to_timestamp(lit("2024-01-09 00:00:00")) &&
          col("ts") < to_timestamp(lit("2024-01-17 00:00:00")),
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
      )
      .orderBy("event_type")
      .collect()
      .toSeq
    val df = q("zorder_scan")
    assert(df.collect().toSeq == plain)
    val planText = df.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters") && planText.contains("zcell"), planText.take(800))
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    val scan = scans(df.queryExecution.executedPlan)
      .find(_.metadata.getOrElse("Location", "").contains("graft-events-zorder"))
      .getOrElse(fail("no scan over the z-order layout found"))
    val partsRead = scan.metrics("numPartitions").value
    assert(partsRead <= 6, s"2-D box must list at most its 6 decomposed cells, read $partsRead")
  }

  test("embedding_outliers: counts conserve and the flag matches per-vector recomputation") {
    val rows = q("embedding_outliers").collect()
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val ppm = math.floor(r.getLong(2).toDouble * 1e6 / r.getLong(1) + 0.5).toLong
      assert(r.getLong(4) == ppm)
      // min_sim below τ=0 iff at least one outlier
      assert((r.getDouble(3) < 0.0) == (r.getLong(2) > 0))
    }
  }

  test("dup_token_fraction: source totals match coverage recomputed from repeated_spans") {
    val islands = q("repeated_spans")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val coveredByDoc = islands
      .groupBy(_._1)
      .view
      .mapValues(_.flatMap { case (_, st, w) => st until (st + w) }.distinct.size.toLong)
      .toMap
    val docs = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long").as("nw"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs
      .groupBy(_._2)
      .view
      .mapValues { ds =>
        val words = ds.map(_._3).sum
        val dups = ds.map(d => coveredByDoc.getOrElse(d._1, 0L)).sum
        (words, dups)
      }
      .toMap
    q("dup_token_fraction").collect().foreach { r =>
      val (w, du) = expected(r.getString(0))
      assert(r.getLong(1) == w, s"${r.getString(0)} words")
      assert(r.getLong(2) == du, s"${r.getString(0)} dup words")
    }
  }

  test("session_stats: histogram marginals reconcile with the sessionize table") {
    val sessions = q("sessionize").collect()
    val hist = q("session_stats").collect()
    assert(hist.map(_.getLong(1)).sum == sessions.length.toLong)
    // Σ size × count = total events
    assert(
      hist.map(r => r.getLong(0) * r.getLong(1)).sum == Tables.events(spark, sfDir).count(),
    )
    val bySize = sessions.groupBy(_.getAs[Long]("n_events"))
    hist.foreach { r =>
      assert(r.getLong(1) == bySize(r.getLong(0)).length.toLong)
      // sum_duration_us accumulates wide but DECLARES BIGINT since r16
      assert(BigInt(r.getLong(3))
        == BigInt(bySize(r.getLong(0)).map(_.getAs[Long]("duration_us")).sum))
    }
  }

  test("funnel_conversion: converted clicks = distinct converting click ids of the pair join") {
    val pairs = q("event_pair_join").collect().map(_.getAs[Long]("click_id")).distinct.length
    val conv = q("funnel_conversion").collect()
    assert(conv.map(_.getLong(2)).sum == pairs.toLong)
    conv.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
  }

  test("skew_diagnostics: top keys match a direct count and ratios recompute") {
    val counts = Tables
      .events(spark, sfDir)
      .groupBy("user_id")
      .count()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val nKeys = counts.length.toLong
    val top = counts.sortBy { case (u, n) => (-n, u) }.take(10)
    val rows = q("skew_diagnostics").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == top.toSeq)
    rows.foreach { r =>
      assert(r.getLong(2) == math.floor(r.getLong(1).toDouble * 1e6 / total + 0.5).toLong)
      assert(r.getLong(3) == math.floor(r.getLong(1).toDouble * 1000.0 * nKeys / total + 0.5).toLong)
    }
  }

  test("rule_model_crosstab: cells partition the corpus and match the declared arms") {
    val rows = q("rule_model_crosstab").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sfDir).count())
    // marginals agree with the declared screens they audit
    val ruleKeep = q("gopher_rules").filter(col("keep")).count()
    assert(rows.filter(_.getBoolean(0)).map(_.getLong(2)).sum == ruleKeep)
    val modelAbove = q("quality_score").filter(col("quality") >= 65.0).count()
    assert(rows.filter(_.getBoolean(1)).map(_.getLong(2)).sum == modelAbove)
  }

  test("dsir_resample: keys recompute from dsir_weights and the draw is the top-K") {
    val weights = q("dsir_weights")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keyed = weights.map { case (id, nf, ws) =>
      val a = (id * 2654435761L) % 2147483647L
      val u = (((a ^ (a >> 7)) * 97381L) % 2147483647L) % 1000000L
      val g = -math.log(-math.log((u + 0.5) / 1000000.0))
      val key = math.floor((ws.toDouble / nf / 1000000.0 + g) * 1000000.0 + 0.5).toLong
      (id, key)
    }
    val expected = keyed.sortBy { case (id, k) => (-k, id) }.take(100).map(_._1).toSeq
    val got = q("dsir_resample").collect().map(_.getLong(0)).toSeq
    assert(got.toSet == expected.toSet)
  }

  test("vocab_coverage: ks are minimal and the curve is monotone") {
    val rows = q("vocab_coverage").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(500000L, 900000L, 990000L))
    assert(rows.map(_.getLong(1)).toSeq.sorted == rows.map(_.getLong(1)).toSeq)
    // coverage at k meets the threshold; k is minimal (k-1 misses it)
    val vocab = Tables
      .documents(spark, sfDir)
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
      .groupBy("w")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }
    val total = vocab.map(_._2).sum
    rows.foreach { r =>
      val (thr, k) = (r.getLong(0), r.getLong(1).toInt)
      val cumK = vocab.take(k).map(_._2).sum
      assert(cumK * 1000000L >= thr * total)
      if (k > 1) assert(vocab.take(k - 1).map(_._2).sum * 1000000L < thr * total)
      assert(r.getLong(2) == cumK)
    }
  }

  test("embedding_dim_stats: moments match a driver-side recomputation") {
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).map(v => math.round(v.toDouble * 1000000.0)).toArray)
    val rows = q("embedding_dim_stats").collect()
    assert(rows.length == vecs.head.length)
    rows.foreach { r =>
      val pos = r.getLong(0).toInt
      val col = vecs.map(_(pos))
      assert(r.getLong(1) == vecs.length.toLong)
      assert(r.getLong(2) == col.sum)
      // s2 accumulates wide but DECLARES BIGINT since round 16
      assert(BigInt(r.getLong(3))
        == col.map(x => BigInt(x) * BigInt(x)).sum)
    }
  }

  test("round-10 hints: bloom word tables are constant-domain; all other broadcasts are scalars") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, ResolvedHint}
    def broadcastHints(name: String): Seq[LogicalPlan] =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.exists(_.toString.contains("broadcast")) =>
          h.child
      }
    def groupingEmpty(p: LogicalPlan): Boolean =
      p.collectFirst { case a: Aggregate if a.groupingExpressions.isEmpty => a }.isDefined
    // bloom_prune_join: the ONLY pinned broadcasts are the bit-array word
    // tables — Aggregates grouped by the word index, whose domain is the
    // CONSTANT m/32 = 512 (a model artifact, not a data relation), so the
    // pin is principled where a vocab-table pin would not be
    val bloomHints = broadcastHints("bloom_prune_join")
    assert(bloomHints.size == 2, s"expected the two word-table hints, got ${bloomHints.size}")
    bloomHints.foreach { h =>
      val grouped = h.collectFirst { case a: Aggregate => a }.get
      assert(
        grouped.groupingExpressions.exists(_.toString.contains("word")),
        s"bloom hint must sit on the constant-domain word table:\n$h",
      )
    }
    // every other round-10 broadcast hint is a grouping-empty (1-row) scalar
    for (name <- Seq("cooccurrence_pmi", "ks_drift", "skew_diagnostics"))
      broadcastHints(name).foreach(h =>
        assert(groupingEmpty(h), s"$name: non-scalar broadcast hint:\n$h"))
    // and these carry no broadcast pins at all — their tables grow with the data
    for (name <- Seq("embedding_outliers", "dup_token_fraction", "sketch_union",
        "event_dedup_window", "session_stats", "funnel_conversion", "rule_model_crosstab",
        "zorder_scan"))
      assert(broadcastHints(name).isEmpty, s"$name must not pin any broadcast")
  }

  test("ks_drift: bounded in [0, 1e6] and matches a driver-side KS for one source") {
    val rows = q("ks_drift").collect()
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L))
    val src = rows.head.getString(0)
    val lens = Tables
      .documents(spark, sfDir)
      .select("source", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val s = lens.filter(_._1 == src).map(_._2).sorted
    val g = lens.map(_._2).sorted
    val grid = g.distinct
    val d = grid.map { v =>
      math.abs(
        s.count(_ <= v).toLong * g.length - g.count(_ <= v).toLong * s.length,
      )
    }.max
    val ksPpm = math.floor(d.toDouble * 1e6 / (s.length.toLong * g.length) + 0.5).toLong
    assert(rows.head.getLong(3) == ksPpm)
    assert(rows.head.getLong(2) == d)
  }
}
