package graft

import org.apache.spark.sql.functions._

/** Round-17 session-2 pins: the seven diagnostics added on top of the
  * re-based graph family — rank statistics (`mann_whitney`,
  * `token_gini`), the Markov entropy view (`transition_entropy`), the
  * triangle census (`knn_triangles`), cluster validity
  * (`calinski_harabasz`), and the offline IR eval pair
  * (`map_eval`/`mrr_eval`). The hash gate proves each equals its own
  * oracle; these pin the INVARIANTS and cross-query identities the
  * semantics rest on (rank-sum totals, wedge bounds, SSE sharing, pool
  * consistency) — facts an oracle restatement cannot itself certify.
  */
class Round17bOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("mann_whitney: rank-sum total identity and U bounds") {
    val rows = run("mann_whitney").collect()
    assert(rows.nonEmpty)
    val n = Tables.documents(spark, sfDir).count()
    // Σ_s (u2 + n1(n1+1)) = Σ_s r1_2 = 2·Σ all midranks = N(N+1)
    val totalR2 = rows.map { r =>
      val n1 = r.getLong(1); val u2 = r.getLong(3)
      u2 + n1 * (n1 + 1)
    }.sum
    assert(totalR2 == n * (n + 1), s"midrank total $totalR2 != ${n * (n + 1)}")
    rows.foreach { r =>
      val n1 = r.getLong(1); val n2 = r.getLong(2); val u2 = r.getLong(3)
      assert(n1 + n2 == n)
      assert(u2 >= 0L && u2 <= 2L * n1 * n2, s"u2=$u2 outside [0, 2·n1·n2]")
      val cle = r.getLong(4)
      assert(cle >= 0L && cle <= 1000000L)
    }
  }

  test("token_gini: coefficient in [0, 1) per source, n/token totals consistent") {
    val rows = run("token_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getLong(3)
      assert(g >= 0L && g < 1000000L, s"gini_e6=$g outside [0, 1e6)")
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L)
    }
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == Tables.documents(spark, sfDir).count())
  }

  test("transition_entropy: 0 ≤ H ≤ ln k, row mass matches event_transitions") {
    val ent = run("transition_entropy").collect()
    assert(ent.nonEmpty)
    ent.foreach { r =>
      val k = r.getLong(2); val h = r.getLong(3)
      assert(h >= 0L, s"negative entropy ${r.getString(0)}: $h")
      // ln k upper bound with 1 µnat slop for the two floors
      val cap = math.floor(math.log(k.toDouble) * 1e6 + 0.5).toLong + 1L
      assert(h <= cap, s"H=$h exceeds ln(k)=$cap for ${r.getString(0)}")
    }
    // same Markov frame as event_transitions: per-prev row mass equal
    val fromMatrix = run("event_transitions")
      .groupBy("prev")
      .agg(sum("n").as("n_out"), count(lit(1)).as("k_next"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    ent.foreach { r =>
      assert(fromMatrix(r.getString(0)) == ((r.getLong(1), r.getLong(2))))
    }
  }

  test("knn_triangles: wedge bound, coefficient range") {
    val r = run("knn_triangles").collect()
    assert(r.length == 1)
    val (ne, nw, nt, gcc) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(ne > 0L && nw >= 0L && nt >= 0L)
    // closed wedges (3 per triangle) are a subset of all wedges
    assert(3L * nt <= nw, s"3·T=$nt exceeds wedges=$nw")
    assert(gcc >= 0L && gcc <= 1000000L)
  }

  test("calinski_harabasz: W shared with kmeans_cost, positive index, counts exact") {
    val r = run("calinski_harabasz").collect()
    assert(r.length == 1)
    val (n, kUsed, w, b, ch) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    assert(n == Tables.embeddings(spark, sfDir).count())
    assert(kUsed >= 1L && kUsed <= 8L)
    // W is the SAME final-assignment SSE kmeans_cost declares
    val wCost = run("kmeans_cost").agg(sum("sse")).collect()(0).getLong(0)
    assert(w == wCost, s"w_sse=$w drifted from kmeans_cost total $wCost")
    assert(b >= 0L && ch >= 0L)
  }

  test("map_eval: hits bounded and depth-monotone, AP ≤ 1") {
    val rows = run("map_eval").collect()
    assert(rows.length == 6) // 2 rankers × 3 depths
    rows.foreach { r =>
      val depth = r.getLong(1); val hits = r.getLong(2); val ap = r.getLong(3)
      assert(hits >= 0L && hits <= math.min(depth, 12L))
      assert(ap >= 0L && ap <= 1000000L)
      if (hits == 0L) assert(ap == 0L)
    }
    Seq("bm25", "qlm").foreach { rk =>
      val hs = rows.filter(_.getString(0) == rk).sortBy(_.getLong(1)).map(_.getLong(2))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, s"$rk hits not depth-monotone")
    }
  }

  test("knn_pagerank: teleport floor and bounded mass on the scaled graph") {
    val rows = run("knn_pagerank").collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getLong(1)).sum
    val scale = operators.DedupOps.PrScale
    val base = (15L * scale) / (100L * n)
    rows.foreach(r => assert(r.getLong(1) >= base, s"rank below teleport floor at ${r.getLong(0)}"))
    // exact-integer recurrence only LOSES mass to floors, never gains:
    // per round ≤ Σdeg (≤ 6n on the distinct symmetrized top-3 graph)
    // from contribution divisions + 2n from the 85% scaling and base
    // floors, + n at init — 100n comfortably covers 5 rounds
    assert(total <= scale)
    assert(total >= scale - 100L * n, s"mass $total leaked (scale $scale, n $n)")
  }

  test("source_diversity: HHI/inverse-Simpson duality and entropy cap") {
    val r = run("source_diversity").collect()
    assert(r.length == 1)
    val (ns, nd, hhi, inv, h) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    assert(nd == Tables.documents(spark, sfDir).count())
    // HHI ranges over [1/k, 1]; inverse Simpson over [1, k]
    assert(hhi >= 1000000L / ns - 1L && hhi <= 1000000L)
    assert(inv >= 1000L && inv <= ns * 1000L)
    // duality: hhi·inv ≈ 10⁹ up to the two truncations
    val prod = hhi * inv
    assert(prod <= 1000000000L && prod >= 1000000000L - (hhi + inv + 1L),
      s"hhi·inv=$prod too far from 1e9")
    val cap = math.floor(math.log(ns.toDouble) * 1e6 + 0.5).toLong + 1L
    assert(h >= 0L && h <= cap)
  }

  test("semantic_contamination: benchmark slice exact, flags consistent") {
    val rows = run("semantic_contamination").collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.length == ((n + 49) / 50).toInt, "one row per benchmark vector")
    rows.foreach { r =>
      val (bid, top, sim, flag) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
      assert(bid % 50L == 0L, "benchmark membership is the mod-50 slice")
      assert(top % 50L != 0L, "top match must come from the training corpus")
      assert(sim <= 1.000001 && sim >= -1.000001)
      assert(flag == (sim >= 0.9), "flag must restate the threshold on the 6-dp sim")
    }
  }

  test("seasonal_decompose: additive identity, seasonal sums near zero") {
    val rows = run("seasonal_decompose").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, t, sE, res) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      // the decomposition is exactly additive by construction
      assert(c * 1000000L == t + sE + res, "c != trend + seasonal + residual")
    }
    // the seasonal offset is one value per (feed, dow) — the join can
    // never fan distinct offsets into one weekday
    rows.groupBy(r => (r.getString(0), r.getLong(2))).foreach { case (k, rs) =>
      assert(rs.map(_.getLong(5)).distinct.length == 1, s"$k carries multiple seasonal offsets")
    }
  }

  test("semantic_loss_by_source: totals shared with semantic_dedup_scaled") {
    val rows = run("semantic_loss_by_source").collect()
    assert(rows.nonEmpty)
    val kept = rows.map(_.getLong(2)).sum
    val total = rows.map(_.getLong(1)).sum
    val survivors = run("semantic_dedup_scaled").count()
    assert(kept == survivors, s"per-source kept $kept != survivor count $survivors")
    assert(total == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000L)
    }
  }

  test("sketch_intersect: inclusion-exclusion identity, estimate brackets truth") {
    val rows = run("sketch_intersect").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ta, tb, ea, eb, eu, ei, ex) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))
      assert(ta < tb)
      assert(ei == ea + eb - eu, "inclusion-exclusion identity broken")
      assert(eu >= math.max(ea, eb) - 1L, "union estimate below a member")
      // m=8192 linear counting at these audience sizes: within 15% + slack
      assert(math.abs(ei - ex) <= ex * 15 / 100 + 50L,
        s"($ta,$tb) est=$ei vs exact=$ex drifted beyond linear-counting error")
    }
  }

  test("weighted_sample: deterministic keys, heavier docs over-represented") {
    val rows = run("weighted_sample").collect()
    assert(rows.length == 100)
    // ranks contiguous, keys nonincreasing
    assert(rows.map(_.getLong(0)).toSeq == (1L to 100L))
    val keys = rows.map(_.getLong(3))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    assert(keys.forall(_ <= 0L), "ln(u)/w keys must be nonpositive")
    // weight-proportional: the sample's mean token count exceeds the corpus mean
    val sampleMean = rows.map(_.getLong(2)).sum / 100.0
    val corpus = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("tok"))
      .agg(avg("tok")).collect()(0).getDouble(0)
    assert(sampleMean > corpus, s"weighted sample mean $sampleMean not above corpus mean $corpus")
  }

  test("bigram_entropy_rate: entropies bounded, MI nonnegative") {
    val r = run("bigram_entropy_rate").collect()
    assert(r.length == 1)
    val (nb, ndist, nctx, hNext, hCond, mi) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4),
        r(0).getLong(5))
    assert(nb >= ndist && ndist >= nctx && nctx >= 1L)
    // conditioning cannot raise entropy (±2 µnat for the declared floors)
    assert(hCond >= -2L && hNext >= hCond - 2L)
    assert(mi == hNext - hCond)
    // entropies under ln(distinct) caps
    val capNext = math.floor(math.log(nb.toDouble) * 1e6 + 0.5).toLong + 2L
    assert(hNext <= capNext)
  }

  test("lorenz_points: monotone shares ending at 100%, consistent with token_gini") {
    val rows = run("lorenz_points").collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(0))
    val gini = run("token_gini").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(3)))).toMap
    bySrc.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // shares nondecreasing in the decile, convex curve below diagonal
      val shares = sorted.map(_.getLong(3))
      assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
      // decile 10 cuts at row n -> full token mass
      assert(sorted.last.getLong(1) == 10L && sorted.last.getLong(3) == 1000000L)
      // each bottom-k share sits on/below the uniform diagonal iff gini >= 0
      val (n, g) = gini(src)
      sorted.foreach { r =>
        val share = r.getLong(3); val frac = r.getLong(2) * 1000000L / n
        if (g > 0L) assert(share <= frac + 1L, s"$src Lorenz point above diagonal")
      }
    }
  }

  test("media_dup_clusters: min-id CC labels, edges land in one cluster") {
    val cc = run("media_dup_clusters").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.nonEmpty)
    // min-id convention + canonical row present
    assert(cc.forall { case (v, l) => l <= v })
    val byLabel = cc.groupBy(_._2)
    assert(byLabel.forall { case (l, members) => members.exists(_._1 == l) })
    // every thresholded near-dup pair is in ONE cluster
    val lbl = cc.toMap
    run("media_near_dup").collect().foreach { r =>
      val (da, db, shared, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (shared * 2 >= math.min(na, nb))
        assert(lbl(da) == lbl(db), s"edge ($da,$db) split across clusters")
    }
  }

  test("nelson_aalen: shared risk table with kaplan_meier, hazard monotone") {
    val na = run("nelson_aalen").collect()
    val km = run("kaplan_meier").collect()
    assert(na.nonEmpty && na.length == km.length)
    // identical (t, n_risk, n_events) rows — the shared kmRiskTable
    assert(
      na.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      "risk tables drifted between the two survival estimators",
    )
    // cumulative hazard is nondecreasing, each increment = d·1e6 DIV n
    var prev = 0L
    na.foreach { r =>
      val (n, dd, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(h - prev == dd * 1000000L / n, "hazard increment drifted from d/n_risk")
      assert(h >= prev)
      prev = h
    }
  }

  test("pettitt_changepoint: statistic bound, feed set shared with cusum") {
    val pet = run("pettitt_changepoint").collect()
    assert(pet.nonEmpty)
    val cus = run("cusum_changepoint").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    pet.foreach { r =>
      val (tpe, n, cp, k, u) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // same type-day grain as cusum: identical feed set and day counts
      assert(cus(tpe) == n, s"$tpe n_days drifted from cusum's grain")
      assert(k == math.abs(u))
      // |U_t| = |Σ_{i≤t}Σ_{j>t} sgn| ≤ t(n−t) ≤ ⌊n²/4⌋
      assert(k <= n * n / 4L, s"$tpe k_stat=$k exceeds n²/4")
      assert(cp >= 0L)
    }
  }

  test("kendall_tau: pair partition identity and bounded correlation") {
    val r = run("kendall_tau").collect()
    assert(r.length == 1)
    val (t0, nc, nd, tx, ty) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    assert(nc + nd <= t0)
    // a pair neither concordant nor discordant is tied in x or in y
    assert(nc + nd + tx + ty >= t0, "untied pair counted as neither C nor D")
    if (!r(0).isNullAt(5)) {
      val tau = r(0).getLong(5)
      assert(tau >= -1000L && tau <= 1000L)
    }
  }

  test("spearman_rho: bounded, frame shared with kendall_tau") {
    val sp = run("spearman_rho").collect()
    assert(sp.length == 1)
    val n = sp(0).getLong(0)
    if (!sp(0).isNullAt(1)) {
      val rho = sp(0).getLong(1)
      assert(rho >= -1000L && rho <= 1000L)
    }
    // same union-of-top-k frame as kendall: t0 = C(n, 2)
    val t0 = run("kendall_tau").collect()(0).getLong(0)
    assert(t0 == n * (n - 1) / 2, s"kendall pair count $t0 != C($n,2)")
  }

  test("cross_source_dup: pair matrix consistent with the cluster substrate") {
    val rows = run("cross_source_dup").collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "matrix must be upper-triangular")
      assert(r.getLong(2) >= 1L)
    }
    // every pair count is bounded by the number of multi-source clusters
    val multi = run("dedup_clusters")
      .join(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        Seq("doc_id"),
      )
      .groupBy("cluster_id")
      .agg(countDistinct("source").as("ns"))
      .filter(col("ns") >= 2)
      .count()
    rows.foreach(r => assert(r.getLong(2) <= multi, "pair count exceeds multi-source clusters"))
  }

  test("mrr_eval: reciprocal exact, consistent with map_eval's shallow hits") {
    val rows = run("mrr_eval").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("bm25", "qlm"))
    val mapHits5 = run("map_eval")
      .filter(col("depth") === 5L)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .toMap
    rows.foreach { r =>
      val frr = r.getLong(1); val rr = r.getLong(2)
      if (frr == 0L) assert(rr == 0L)
      else {
        assert(rr == 1000000L / frr)
        // a first relevant hit within rank 5 must show as a depth-5 AP hit
        if (frr <= 5L) assert(mapHits5(r.getString(0)) >= 1L)
        else assert(mapHits5(r.getString(0)) == 0L || frr > 5L)
      }
    }
  }
}
