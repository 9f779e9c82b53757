package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-15 second/third blocks — the
  * checks the hash gate can't express: conservation laws, bounds, and
  * cross-query consistency between the new queries and the substrates
  * they claim to ride.
  */
class Round15bOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("knn_reciprocity conserves the knn_graph edge set and counts true mutual pairs") {
    val edges = run("knn_graph")
      .select("src", "nbr")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = run("knn_reciprocity").collect()
    assert(rows.map(_.getLong(1)).sum == edges.length,
      "per-rank edge counts must sum to the declared edge set")
    val set = edges.toSet
    val wantMutual = edges.count { case (s, n) => set.contains((n, s)) }
    assert(rows.map(_.getLong(2)).sum == wantMutual,
      "mutual counts must equal an independent set-membership recount")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "mutual <= edges per rank")
      assert(r.getLong(3) == r.getLong(2) * 1000 / r.getLong(1), "rate arithmetic")
    }
  }

  test("label_propagation: seeds counted exactly, coverage and agreement bounded") {
    val rows = run("label_propagation").collect()
    val emb = Tables.embeddings(spark, sfDir)
    assert(rows.map(_.getLong(1)).sum == emb.count(), "label partition covers the corpus")
    val wantSeeds = emb.filter(col("vec_id") % 5 === 0).count()
    assert(rows.map(_.getLong(2)).sum == wantSeeds, "seed count = vec_id % 5 == 0 rows")
    rows.foreach { r =>
      val (n, seeds, filled, correct) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(correct <= filled, "agreement only among filled vectors")
      assert(filled <= n - seeds, "filled only among non-seeds")
    }
    // two hops over a top-3 graph on clustered fixtures must label most
    // of the corpus — a propagation that fills ~nothing is a wiring bug
    val filled = rows.map(_.getLong(3)).sum
    val nonSeeds = rows.map(_.getLong(1)).sum - wantSeeds
    assert(filled * 10 >= nonSeeds * 5, s"two-hop coverage collapsed: $filled of $nonSeeds")
  }

  test("simhash_bit_balance: 30 bits, doc count constant, shares consistent") {
    val rows = run("simhash_bit_balance").collect()
    assert(rows.length == 30)
    val nDocs = Tables.documents(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getLong(1) == nDocs, "every bit row audits the whole corpus")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= nDocs)
      assert(r.getLong(3) == r.getLong(2) * 1000 / nDocs)
      assert(r.getLong(4) == (if (math.abs(r.getLong(3) - 500) > 100) 1L else 0L))
    }
  }

  test("split_ngram_overlap: containment bounded and consistent with the split") {
    val rows = run("split_ngram_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "overlap cannot exceed val grams")
      assert(r.getLong(3) == r.getLong(2) * 1000000 / r.getLong(1))
    }
  }

  test("k_anonymity and l_diversity: grids monotone, totals constant, cross-consistent") {
    val ka = run("k_anonymity").collect()
    val ld = run("l_diversity").collect()
    // n_classes and n_rows identical on every grid row (same class table)
    assert(ka.map(_.getLong(1)).distinct.length == 1)
    assert(ka.map(_.getLong(3)).max <= ka.head.getLong(1) * ka.map(_.getLong(0)).max)
    // risk is monotone in the threshold
    assert(ka.map(_.getLong(2)).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "classes below k must be non-decreasing in k")
    assert(ld.map(_.getLong(2)).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "classes below l must be non-decreasing in l")
    // at the shared threshold 2: ldiv <= csz, so csz < 2 implies ldiv < 2
    val ka2 = ka.find(_.getLong(0) == 2L).get.getLong(2)
    val ld2 = ld.find(_.getLong(0) == 2L).get.getLong(2)
    assert(ld2 >= ka2, "low-diversity classes must include every small class at the same bound")
  }

  test("gap_burstiness: bands partition the qualifying users, B within [-1000, 1000]") {
    val rows = run("gap_burstiness").collect()
    val wantUsers = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5) // >= 5 events = >= 4 gaps
      .count()
    assert(rows.map(_.getLong(1)).sum == wantUsers,
      "band histogram must partition users with >= 4 gaps")
    rows.foreach { r =>
      assert(r.getLong(3) >= -1000 && r.getLong(4) <= 1000, "B is a bounded statistic")
      assert(r.getLong(3) <= r.getLong(4))
    }
  }

  test("pq_distortion: one row per subspace, occupancy and error bounded") {
    val rows = run("pq_distortion").collect()
    assert(rows.length == 8, "NSub rows")
    val n = Tables.embeddings(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n, "every subspace encodes the whole corpus")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 16, "occupancy within the K budget")
      assert(r.getLong(3) >= 0 && r.getLong(4) == r.getLong(3) / n)
    }
  }

  test("skipgram_pmi: distance split conserves the pair count; min-count respected") {
    run("skipgram_pmi").collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(3) + r.getLong(4), "c12 = c_adj + c_skip")
      assert(r.getLong(2) >= 5, "min-count filter")
    }
  }

  test("centroid_distance_matrix: strict upper triangle, cosine within [-1, 1]") {
    val rows = run("centroid_distance_matrix").collect()
    val labels = Tables.embeddings(spark, sfDir).select("label").distinct().count()
    assert(rows.length == labels * (labels - 1) / 2, "one row per unordered label pair")
    rows.foreach { r =>
      assert(r.getInt(0) < r.getInt(1), "upper triangle only")
      val c = r.getDouble(4)
      assert(c >= -1.0000001 && c <= 1.0000001, s"cosine out of range: $c")
    }
  }

  test("dirichlet_qlm: dense ranks, scores non-increasing") {
    val rows = run("dirichlet_qlm").collect()
    assert(rows.map(_.getLong(2)).toSeq == (1L to rows.length))
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("session_funnel conserves session_stats' session partition") {
    val funnel = run("session_funnel").collect()
    val stats = run("session_stats").collect()
    // both ride sessionAssigned/sessionTable: total session counts match
    assert(funnel.map(_.getLong(1)).sum == stats.map(_.getLong(1)).sum,
      "funnel buckets must partition exactly the sessions session_stats counts")
    funnel.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "converted <= with-click")
      assert(r.getLong(2) <= r.getLong(1), "with-click <= sessions")
    }
  }

  test("ranker_agreement: overlap bounded by depth and non-decreasing") {
    val rows = run("ranker_agreement").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L, 10L, 20L))
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0), "overlap cannot exceed depth"))
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "top-d intersection is monotone in d")
  }

  test("mmr_rerank: step 1 is the BM25 top hit; selections are distinct candidates") {
    val mmr = run("mmr_rerank").collect()
    val bm = run("bm25_rank").collect()
    assert(mmr.length == 5)
    assert(mmr.map(_.getLong(0)).toSeq == (1L to 5L), "dense steps")
    assert(mmr.head.getLong(1) == bm.head.getLong(0),
      "with no selection, MMR reduces to pure relevance — the BM25 rank-1 doc")
    val docs = mmr.map(_.getLong(1))
    assert(docs.distinct.length == docs.length, "no candidate selected twice")
    val bmSet = bm.map(_.getLong(0)).toSet
    assert(docs.forall(bmSet.contains), "selections come from the BM25 top-20")
    assert(mmr.head.getLong(3) == 0L, "step 1 has no redundancy term")
    mmr.foreach(r => assert(r.getLong(4) == 7L * r.getLong(2) - 3L * r.getLong(3)))
  }

  test("ab_test_significance: cohorts partition the users, bounds hold") {
    val r = run("ab_test_significance").collect().head
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(2) == users, "cohorts partition the distinct users")
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2),
      "conversions bounded by cohort size")
    assert(r.getLong(5) == (if (!r.isNullAt(4) && math.abs(r.getLong(4)) > 1960) 1L else 0L))
  }

  test("chi2_independence: shape, df, and an independent double recomputation") {
    val r = run("chi2_independence").collect().head
    assert(r.getLong(2) == (r.getLong(0) - 1) * (r.getLong(1) - 1), "df = (r-1)(c-1)")
    assert(r.getLong(3) >= 0, "chi-square is non-negative")
    // recompute from raw events with plain doubles; the declared value
    // quantizes per cell, so agreement within n_cells half-ulps of 1e-3
    val cells = Tables.events(spark, sfDir)
      .withColumn("dow", org.apache.spark.sql.functions.expr(
        "(unix_micros(ts) DIV 86400000000 + 4) % 7"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o")).collect()
      .map(x => ((x.getString(0), x.getLong(1)), x.getLong(2)))
    val n = cells.map(_._2).sum.toDouble
    val rm = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
    val cm = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum.toDouble).toMap
    val chi2 = cells.map { case ((t, w), o) =>
      val e = rm(t) * cm(w) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2 * 1000.0 - r.getLong(3)) <= cells.length.toDouble,
      s"declared ${r.getLong(3)} vs recomputed ${chi2 * 1000}")
  }

  test("cusum_changepoint: full-series deviation sum telescopes to zero; peak is real") {
    import org.apache.spark.sql.functions.{abs => fabs}
    val rows = run("cusum_changepoint").collect()
    val types = Tables.events(spark, sfDir).select("event_type").distinct().count()
    assert(rows.length == types, "one change-point row per event type")
    // independent recomputation of the per-type peak
    val dc = Tables.events(spark, sfDir)
      .withColumn("day_no", org.apache.spark.sql.functions.expr(
        "unix_micros(ts) DIV 86400000000"))
      .groupBy("event_type", "day_no").agg(count(lit(1)).as("c")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    rows.foreach { r =>
      val t = r.getString(0)
      val series = dc.filter(_._1 == t).sortBy(_._2)
      val dT = series.length.toLong
      val sT = series.map(_._3).sum
      var cum = 0L
      var best = (0L, 0L) // (day, cusum) at peak |cusum|, day tiebreak asc
      var bestAbs = -1L
      series.foreach { case (_, day, c) =>
        cum += c * dT - sT
        if (math.abs(cum) > bestAbs) { bestAbs = math.abs(cum); best = (day, cum) }
      }
      assert(cum == 0L, s"$t: full-series CUSUM must telescope to 0, got $cum")
      assert(r.getLong(2) == best._1 && r.getLong(3) == best._2,
        s"$t: declared peak (${r.getLong(2)}, ${r.getLong(3)}) vs recomputed $best")
    }
  }

  test("exp_smooth_forecast: closed form tracks the sequential SES recurrence") {
    val rows = run("exp_smooth_forecast").collect()
    val dc = Tables.events(spark, sfDir)
      .withColumn("day_no", org.apache.spark.sql.functions.expr(
        "unix_micros(ts) DIV 86400000000"))
      .groupBy("event_type", "day_no").agg(count(lit(1)).as("c")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    rows.foreach { r =>
      val series = dc.filter(_._1 == r.getString(0)).sortBy(_._2).map(_._3.toDouble)
      assert(r.getLong(1) == series.length)
      assert(r.getLong(2) == series.last.toLong)
      // sequential L_k = 0.3 x_k + 0.7 L_{k-1}; the declared closed form
      // quantizes each of n terms to a half-ulp of 1e-6, so the gap is
      // bounded by n_days in e6 units
      val seq = series.tail.foldLeft(series.head)((l, x) => 0.3 * x + 0.7 * l)
      assert(math.abs(r.getLong(3) - seq * 1e6) <= series.length.toDouble + 1.0,
        s"${r.getString(0)}: level_e6 ${r.getLong(3)} vs sequential ${seq * 1e6}")
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2) * 1000000L)
    }
  }

  test("forecast_baselines: pair counts tie to the SES day series") {
    val fb = run("forecast_baselines").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val ses = run("exp_smooth_forecast").collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    assert(fb.keySet == ses.keySet, "same feed set across the grain riders")
    fb.foreach { case (t, (nNaive, nSeasonal)) =>
      val days = ses(t)
      assert(nNaive == days - 1, s"$t: naive pairs = days - 1")
      assert(nSeasonal == math.max(0L, days - 7), s"$t: seasonal pairs = days - 7")
    }
  }

  test("traffic_anomaly: a full queue, ranked by exact deviation") {
    val rows = run("traffic_anomaly").collect()
    assert(rows.length == 10, "top-10 queue must be satisfiable at every sf")
    val devs = rows.map(_.getLong(6))
    assert(devs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)), "descending dev_ppm")
    rows.foreach { r =>
      assert(r.getLong(6) == math.abs(r.getLong(3) * r.getLong(4) - r.getLong(5)) * 1000000 / r.getLong(5))
    }
  }
}
