package graft

import org.apache.spark.sql.functions._

/** Third round-16 block: semantic invariants for the session's four
  * additions — ndcg_eval (metric identities), dbscan_clusters (density
  * role algebra), kcenter_coreset (greedy covering-radius properties),
  * textrank_keywords (rank-mass and ordering discipline).
  */
class Round16cOpsSpec extends SparkSpec {

  test("ndcg_eval: grid complete, IDCG ranker-independent, NDCG = quotient and <= 1000") {
    val rows = SparkEntry.queries("ndcg_eval")(spark, sfDir).collect()
    assert(rows.length == 6, "2 rankers x 3 depths")
    val byKey = rows.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(byKey.keySet == (for (rk <- Set("bm25", "qlm"); dp <- Set(5L, 10L, 20L)) yield (rk, dp)))
    Seq(5L, 10L, 20L).foreach { dp =>
      // IDCG is a property of the judged pool, not the ranker
      assert(byKey(("bm25", dp)).getLong(3) == byKey(("qlm", dp)).getLong(3),
        s"idcg at depth $dp must be ranker-independent")
    }
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(idcg > 0L, "judged pool is non-empty at every sf")
      assert(dcg >= 0L && dcg <= idcg, "the ideal ordering maximizes DCG")
      assert(ndcg == dcg * 1000L / idcg, "ndcg_e3 must be the truncating quotient")
      assert(ndcg >= 0L && ndcg <= 1000L)
    }
    // IDCG grows with depth (more judged gains enter the ideal sum)
    val i5 = byKey(("bm25", 5L)).getLong(3)
    val i10 = byKey(("bm25", 10L)).getLong(3)
    val i20 = byKey(("bm25", 20L)).getLong(3)
    assert(i5 <= i10 && i10 <= i20, "idcg must be non-decreasing in depth")
  }

  test("dbscan_clusters: role algebra — core iff degree >= MinPts, labels are core min-ids") {
    val rows = SparkEntry.queries("dbscan_clusters")(spark, sfDir).collect()
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(rows.length == nVec, "one row per vector")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "vec_ids unique")
    val coreIds = rows.filter(_.getString(1) == "core").map(_.getLong(0)).toSet
    val labelsOf = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (id, role, cluster, degree) = (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(degree >= 0L)
      if (role == "core") {
        assert(degree >= 4L, s"core $id must have degree >= MinPts")
        assert(cluster >= 0L && cluster <= id, s"core $id label must be a min-id <= self")
        // the label itself is a core whose own label is itself (component min)
        assert(coreIds.contains(cluster), s"label $cluster of core $id must be a core")
        assert(labelsOf(cluster) == cluster, s"label $cluster must be self-labeled")
      } else if (role == "border") {
        assert(degree > 0L && degree < 4L, s"border $id must be sub-MinPts with neighbors")
        assert(coreIds.contains(cluster), s"border $id must adopt a core component label")
      } else {
        assert(role == "noise" && cluster == -1L, s"$id must be noise with label -1")
      }
    }
    // the paradigm is non-degenerate on the fixtures: all three roles occur
    val roles = rows.map(_.getString(1)).toSet
    assert(roles == Set("core", "border", "noise"), s"expected all roles, got $roles")
  }

  test("kcenter_coreset: seed = min id, radii non-increasing, first pick is the true argmax") {
    val rows = SparkEntry.queries("kcenter_coreset")(spark, sfDir).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L), "sel_rank must be 1..8")
    assert(rows.map(_.getLong(1)).distinct.length == 8, "picks must be distinct")
    val minId = Tables.embeddings(spark, sfDir).agg(min("vec_id")).collect()(0).getLong(0)
    assert(rows(0).getLong(1) == minId && rows(0).getLong(2) == 0L,
      "seed is the min vec_id at distance 0")
    val d2s = rows.drop(1).map(_.getLong(2))
    assert(d2s.forall(_ > 0L), "covering radii positive on non-duplicate fixtures")
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b },
      "covering-radius curve must be non-increasing")
    // independent recompute of pick 2: the farthest point from the seed
    graft.functions.GraftFunctions.register(spark)
    val q = Tables
      .embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) + 2000000)",
        ).as("q"),
      )
    val seedVec = q.filter(col("vec_id") === minId).collect()(0).getSeq[Long](1)
    val far = q
      .withColumn("d2", call_function("graft_int_sqdist", col("q"), typedlit(seedVec)))
      .select("vec_id", "d2")
      .orderBy(col("d2").desc, col("vec_id"))
      .limit(1)
      .collect()(0)
    assert(rows(1).getLong(1) == far.getLong(0) && rows(1).getLong(2) == far.getLong(1),
      "pick 2 must be the exact farthest point from the seed")
  }

  test("transition_pagerank: covers every transitioning type, conserves rank mass") {
    val rows = SparkEntry.queries("transition_pagerank")(spark, sfDir).collect()
    val types = Tables
      .events(spark, sfDir)
      .select("event_type")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    // on the dense fixtures every type both sends and receives transitions
    assert(rows.map(_.getString(0)).toSet == types, "node set = transitioning event types")
    val n = rows.length.toLong
    val base = (15L * operators.DedupOps.PrScale) / (100L * n)
    rows.foreach(r => assert(r.getLong(1) >= base, "every node keeps the teleport floor"))
    // damped mass conservation: total stays within n floors of the scale
    val tot = rows.map(_.getLong(1)).sum
    assert(tot <= operators.DedupOps.PrScale, "floor division only loses mass")
    assert(tot >= operators.DedupOps.PrScale - 200L * n,
      s"mass leak beyond floor losses: $tot")
  }

  test("kaplan_meier: risk set and survival non-increasing, curve = fold of its own columns") {
    val rows = SparkEntry.queries("kaplan_meier")(spark, sfDir).collect()
    assert(rows.nonEmpty, "deaths exist at every sf (users purchase quickly)")
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows(0).getLong(1) <= nUsers, "risk set bounded by the user universe")
    val ts = rows.map(_.getLong(0))
    assert(ts.sorted.toSeq == ts.toSeq && ts.distinct.length == ts.length)
    val risks = rows.map(_.getLong(1))
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b }, "n_risk non-increasing")
    var s = 1000000L
    rows.foreach { r =>
      val (nRisk, d, surv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d > 0L && d <= nRisk)
      s = s * (nRisk - d) / nRisk
      assert(surv == s, "surv_e6 must equal the truncating fold of (n_risk, d)")
    }
    assert(s >= 0L && s <= 1000000L)
  }

  test("assoc_rules: directional pairs share counts, support bounds confidence") {
    val rows = SparkEntry.queries("assoc_rules")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length % 2 == 0, "each unordered pair yields two rules")
    val byDir = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    byDir.foreach { case ((a, b), r) =>
      assert(a != b)
      val rev = byDir((b, a)) // the reverse direction exists
      assert(r.getLong(2) == rev.getLong(2), "co-occurrence count is symmetric")
      assert(r.getLong(3) == rev.getLong(3), "support is symmetric")
      assert(r.getLong(5) == rev.getLong(5), "lift is symmetric")
      val (supp, conf) = (r.getLong(3), r.getLong(4))
      assert(supp > 0L && supp <= conf && conf <= 1000000L,
        "supp <= conf <= 1 (antecedent sessions are a subset of all sessions)")
    }
  }

  test("hits_scores: L1-normalized to 1e6 within truncation loss, scores in range") {
    val rows = SparkEntry.queries("hits_scores")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val hubs = rows.map(_.getLong(1))
    val auths = rows.map(_.getLong(2))
    (hubs ++ auths).foreach(v => assert(v >= 0L && v <= 1000000L))
    assert(hubs.sum <= 1000000L && hubs.sum >= 1000000L - n,
      s"hub mass ${hubs.sum} must be 1e6 minus at most one floor per node")
    assert(auths.sum <= 1000000L && auths.sum >= 1000000L - n,
      s"authority mass ${auths.sum} must be 1e6 minus at most one floor per node")
  }

  test("psi_drift: one row per source, PSI non-negative, bin grid shared") {
    val rows = SparkEntry.queries("psi_drift")(spark, sfDir).collect()
    val nSrc = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(rows.length == nSrc, "one PSI row per source")
    val binCounts = rows.map(_.getLong(2)).distinct
    assert(binCounts.length == 1, "every source is scored on the corpus's own bin grid")
    rows.foreach { r =>
      // PSI = a sum of (p-q)ln(p/q) terms, each >= 0 (same sign factors);
      // per-bin flooring can shave at most 1e-9 per bin
      assert(r.getLong(3) >= -r.getLong(2), s"psi_e9 ${r.getLong(3)} below floor-loss bound")
      assert(r.getLong(1) > 0L)
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sfDir).count(), "source sizes partition the corpus")
  }

  test("auc_score: bounds, class split, and agreement with a direct O(PN) recompute") {
    val rows = SparkEntry.queries("auc_score")(spark, sfDir).collect()
    assert(rows.length == 1)
    val (p, n, auc) = (rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2))
    assert(p > 0L && n > 0L && auc >= 0L && auc <= 1000000L)
    assert(p + n == Tables.embeddings(spark, sfDir).count() - 1, "query row excluded")
    // independent quadratic recompute on the sf0.001 fixture (499 vecs)
    graft.functions.GraftFunctions.register(spark)
    val qz = Tables
      .embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        col("label"),
        expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))")
          .as("qv"),
      )
      .collect()
    val q0 = qz.find(_.getLong(0) == 0L).get
    val (qv, l0) = (q0.getSeq[Long](2).toArray, q0.getInt(1))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val scored = qz.filter(_.getLong(0) != 0L).map { r =>
      (dot(qv, r.getSeq[Long](2).toArray), r.getInt(1) == l0)
    }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    var u2 = BigInt(0)
    pos.foreach { s =>
      neg.foreach { t =>
        if (s > t) u2 += 2 else if (s == t) u2 += 1
      }
    }
    val expected = (u2 * 1000000 / (BigInt(2) * pos.length * neg.length)).toLong
    assert(p == pos.length && n == neg.length)
    assert(auc == expected, s"distributed grain AUC $auc != all-pairs recompute $expected")
  }

  test("knn_modularity: partition totals close, contributions = stated quotients") {
    val rows = SparkEntry.queries("knn_modularity")(spark, sfDir).collect()
    val nLbl = Tables.embeddings(spark, sfDir).select("label").distinct().count()
    assert(rows.length == nLbl, "one row per class")
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sfDir).count(),
      "classes partition the node set")
    val m = rows.map(_.getLong(3)).sum / 2 // sum of degrees = 2m
    assert(m > 0L)
    assert(rows.map(_.getLong(2)).sum <= m, "intra-class edges are a subset of all edges")
    rows.foreach { r =>
      val (eIn, dSum, contrib) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val expected =
        eIn * 1000000L / m - (BigInt(dSum) * dSum * 1000000 / (BigInt(4) * m * m)).toLong
      assert(contrib == expected, s"contrib_e6 $contrib != recomputed $expected")
    }
  }

  test("good_turing: hapax-rich table, r* consistent with adjacent bands") {
    val rows = SparkEntry.queries("good_turing")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byR = rows.map(r => r.getLong(0) -> r).toMap
    assert(byR.contains(1L) && byR(1L).getLong(1) > 0L,
      "the trigram grain must be hapax-rich (N_1 > 0) — GT's whole point")
    rows.foreach { r =>
      val (rr, nr, mass) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(rr >= 1L && nr > 0L, "only observed bands appear")
      assert(mass >= 0L && mass <= 1000000000L, "band mass is a probability share")
      byR.get(rr + 1L).foreach { next =>
        assert(r.getLong(2) == (rr + 1L) * next.getLong(1) * 1000000L / nr,
          s"r*($rr) must equal (r+1)N_(r+1)/N_r from the adjacent band")
      }
    }
    assert(rows.map(_.getLong(3)).sum <= 1000000000L,
      "capped bands cannot exceed total probability mass")
  }

  test("textrank_keywords: top-k discipline and corpus-vocabulary membership") {
    val rows = SparkEntry.queries("textrank_keywords")(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "rank must be 1..10")
    assert(rows.map(_.getString(1)).distinct.length == 10, "terms distinct")
    val rs = rows.map(r => (r.getLong(2), r.getString(1)))
    assert(rs.sortBy { case (r, t) => (-r, t) }.toSeq == rs.toSeq,
      "ordered by (rank value desc, term)")
    assert(rs.forall(_._1 > 0L), "damped recurrence keeps every rank above the teleport floor")
    val vocab = Tables
      .documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(rows.forall(r => vocab.contains(r.getString(1))), "keywords come from the corpus")
  }
}
