package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-10 linkage/moments/LM additions,
  * each checked against an INDEPENDENT driver-side recomputation at
  * sf0.001 (small enough to collect) — the oracle gate proves
  * cross-engine equality, these prove the math means what the docstrings
  * claim.
  */
class LinkageMomentsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private lazy val texts: Seq[(Long, Array[String])] =
    Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .toSeq
      .map(r => r.getLong(0) -> r.getString(1).split(" "))

  test("kneser_ney_logprob matches a sequential driver-side KN model") {
    // Build the bigram/continuation tables exactly as the query defines
    // them, in plain Scala, and recompute doc 0's mean surprisal.
    val allPairs = texts.flatMap { case (_, ws) => ws.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))) }
    val cb = allPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cu = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1a = cb.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1b = cb.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val t = cb.size.toLong
    def cost(w1: String, w2: String): Long = {
      val p = math.max(cb((w1, w2)).toDouble - 0.75, 0.0) / cu(w1).toDouble +
        (0.75 * n1a(w1).toDouble / cu(w1).toDouble) * (n1b(w2).toDouble / t.toDouble)
      math.floor(-math.log(p) * 1e6 + 0.5).toLong
    }
    val doc0 = texts.find(_._1 == 0L).get._2
    val expSum = doc0.sliding(2).filter(_.length == 2).map(a => cost(a(0), a(1))).sum
    val row = q("kneser_ney_logprob").filter(col("doc_id") === 0L).head
    assert(row.getLong(1) == doc0.length - 1L, "n_bigrams must be n_tokens - 1")
    assert(row.getLong(2) == expSum, "KN cost sum diverged from the sequential model")
  }

  test("kneser_ney is a proper model: every cost positive, KN differs from Laplace") {
    val kn = q("kneser_ney_logprob").select("doc_id", "cost_sum").collect()
    assert(kn.forall(_.getLong(1) > 0L))
    val laplace =
      q("bigram_logprob").select("doc_id", "cost_sum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Same transitions, different smoothing: the totals must not be
    // identical across the corpus (they would be iff the smoothers agree
    // everywhere, which KN's discounting forbids on seen bigrams).
    assert(kn.exists(r => laplace(r.getLong(0)) != r.getLong(1)))
  }

  test("embedding_covariance matches driver-side exact moments; diagonal is a variance") {
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1e4 + 0.5).toLong).toArray)
    val n = vecs.length.toLong
    def moments(i: Int, j: Int): (Long, Long, Long) =
      (vecs.map(_(i)).sum, vecs.map(_(j)).sum, vecs.map(v => v(i) * v(j)).sum)
    val got = q("embedding_covariance").collect().map(r => ((r.getInt(0), r.getInt(1)), r)).toMap
    assert(got.size == 64 * 65 / 2, "upper triangle of a 64-dim space")
    for ((i, j) <- Seq((0, 0), (0, 1), (13, 40), (63, 63))) {
      val (si, sj, sij) = moments(i, j)
      val r = got((i, j))
      // si/sj/sij accumulate in the DECIMAL(38,0) wide tier but DECLARE
      // as BIGINT since round 16 ("BIGINT means out")
      def dec(k: Int) = BigInt(r.getLong(k))
      assert(r.getLong(2) == n && dec(3) == BigInt(si) && dec(4) == BigInt(sj)
        && dec(5) == BigInt(sij))
    }
    // diagonal: E[x²] − E[x]² ≥ 0 for every dim
    got.filter { case ((i, j), _) => i == j }.values.foreach { r =>
      assert(r.getDouble(6) >= 0.0, s"negative variance at dim ${r.getInt(0)}")
    }
  }

  test("hard_negatives: never the anchor's own label, descending sims, exact vs driver") {
    val rows = q("hard_negatives").collect()
    val labels = Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "label")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    rows.foreach(r => assert(r.getInt(3) != labels(r.getLong(0)), "negative shares the anchor label"))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sims = g.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "sims must be rank-descending")
    }
    // independent top-1 for anchor 0 from collected vectors
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val (a, av, al) = vecs.find(_._1 == 0L).get
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(p => p * p).sum))
    }
    val best = vecs
      .filter(v => v._3 != al && v._1 != a)
      .map(v => (BigDecimal(cos(av, v._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP), v._1))
      .sortBy { case (s, id) => (-s, id) }
      .head
    val top = rows.filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L).head
    assert(top.getLong(2) == best._2, s"anchor 0 top negative should be ${best._2}")
  }

  test("length_buckets: buckets partition the corpus and waste is consistent") {
    val rows = q("length_buckets").collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total, "buckets must partition the corpus")
    rows.foreach { r =>
      val (cap, nDocs, real, pad, ppm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(real + pad == cap * nDocs, "real + pad must fill the padded slots")
      assert(ppm >= 0L && ppm < 1000000L)
      assert(ppm == math.floor(pad.toDouble * 1e6 / (cap * nDocs) + 0.5).toLong)
    }
  }

  test("agg_state_merge: merged state equals from-scratch on every key (parity all true)") {
    val rows = q("agg_state_merge").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(5)), "a non-mergeable state would flip parity false")
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.length.toLong == users, "one state row per user")
  }

  test("record_linkage: scores come from the declared weight model and blocking holds") {
    val rows = q("record_linkage").collect()
    assert(rows.nonEmpty)
    val cust = Tables
      .customer(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(2), math.floor(r.getDouble(3) / 1000.0).toLong, r.getString(1)))
      .toMap
    val supp = Tables
      .supplier(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(2), math.floor(r.getDouble(3) / 1000.0).toLong, r.getString(1)))
      .toMap
    def num(name: String): Long = name.reverse.takeWhile(_.isDigit).reverse.toLong % 100L
    rows.foreach { r =>
      val (ck, sk, nk, score) = (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))
      val (cn, cb, cname) = cust(ck)
      val (sn, sb, sname) = supp(sk)
      assert(cn == nk && sn == nk, "pair must share the blocking key")
      val exp = (if (cb == sb) 24L else -8L) + (if (num(cname) == num(sname)) 18L else -6L)
      assert(score == exp && score >= 10L)
    }
  }

  test("knn_graph: agrees with cosine_lsh_ann on the shared anchors; ranks well-formed") {
    val rows = q("knn_graph").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) <= 3L, "candidate beyond the banding radius"))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val ranks = g.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length), "ranks must be contiguous from 1")
      val sims = g.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // The graph restricted to the LSH anchors must equal cosine_lsh_ann's
    // top-3 prefix — same candidates, same ranking, different driver.
    val ann = SparkEntry
      .queries("cosine_lsh_ann")(spark, sfDir)
      .collect()
      .filter(_.getLong(1) <= 3L)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val graphOnAnchors = rows
      .filter(r => ann.exists(_._1 == r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(graphOnAnchors == ann, "knn_graph diverged from cosine_lsh_ann on shared anchors")
  }

  test("event_trigrams matches a sequential driver-side path count") {
    val evs = Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val counts = evs
      .groupBy(_._1)
      .values
      .flatMap(g => g.sortBy(e => (e._4, e._2)).map(_._3).sliding(3).filter(_.length == 3).map(_.toList))
      .toSeq
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toSeq
      .map { case (p, n) => (n, p(0), p(1), p(2)) }
      .sortBy { case (n, a, b, c) => (-n, a, b, c) }
      .take(20)
    val got = q("event_trigrams").collect().map(r => (r.getLong(3), r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == counts, "top-20 trigram paths diverged from the sequential count")
  }

  test("calibration_bins: bins partition the corpus and keep counts reconcile") {
    val rows = q("calibration_bins").collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 9L)
      assert(r.getLong(2) <= r.getLong(1))
      assert(
        r.getLong(3) ==
          math.floor(r.getLong(2).toDouble * 1e6 / r.getLong(1) + 0.5).toLong,
      )
    }
    val ruleKeeps = SparkEntry
      .queries("gopher_rules")(spark, sfDir)
      .filter(col("keep"))
      .count()
    assert(rows.map(_.getLong(2)).sum == ruleKeeps, "per-bin keeps must total the rule screen's keeps")
  }

  test("lang_confusion reconciles with lang_id's per-doc predictions") {
    val fromLangId = SparkEntry
      .queries("lang_id")(spark, sfDir)
      .groupBy("lang", "predicted")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val rows = q("lang_confusion").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(fromLangId((r.getString(0), r.getString(1))) == r.getLong(2))
    }
    assert(rows.length == fromLangId.size, "confusion matrix must cover every observed cell")
    // per-language recall ppm sums to ~1e6 (floor rounding: within L cells)
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val s = g.map(_.getLong(3)).sum
      assert(math.abs(s - 1000000L) <= g.length, s"recall ppm off: $s")
    }
  }

  test("score_length_bias matches a driver-side exact Pearson computation") {
    val lens = texts.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val ys = SparkEntry
      .queries("quality_score")(spark, sfDir)
      .select("doc_id", "quality")
      .collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 10000.0 + 0.5).toLong)
    val n = ys.length.toLong
    val xs = ys.map { case (id, _) => lens(id) }
    val yv = ys.map(_._2)
    val (sx, sy) = (xs.sum, yv.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = yv.map(y => y * y).sum
    val sxy = ys.map { case (id, y) => lens(id) * y }.sum
    val exp = BigDecimal(
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt(
          (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
            * (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble),
        ),
    ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = q("score_length_bias").head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - exp) < 1e-9, s"corr ${row.getDouble(1)} != $exp")
  }

  test("dedup_sweep_cost: monotone in the cap, totals conserved") {
    val rows = q("dedup_sweep_cost").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).sameElements(Array(25L, 50L, 100L, 200L)))
    val totals = rows.map(r => r.getLong(1) + r.getLong(2)).distinct
    assert(totals.length == 1, "kept + dropped must be the corpus gram-type count at every cap")
    val kept = rows.map(_.getLong(1))
    val occ = rows.map(_.getLong(3))
    val pairs = rows.map(_.getLong(4))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b })
    assert(occ.zip(occ.tail).forall { case (a, b) => a <= b })
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a <= b })
    rows.foreach(r => assert(r.getLong(4) >= 0L && r.getLong(3) >= r.getLong(1)))
  }

  test("knn_components: labels are a valid CC labelling of the declared knn graph") {
    val edges = q("knn_graph").collect().map(r => (r.getLong(0), r.getLong(2)))
    val labels = q("knn_components").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge endpoint pair shares a label (consistency)
    edges.foreach { case (a, b) => assert(labels(a) == labels(b), s"edge ($a,$b) straddles clusters") }
    // labels are component minima: recompute components driver-side (union-find)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    labels.keys.foreach(k => find(k))
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val comps = labels.keys.groupBy(k => find(k))
    comps.foreach { case (_, members) =>
      val mn = members.min
      members.foreach(m => assert(labels(m) == mn, s"member $m labelled ${labels(m)}, expected min $mn"))
    }
  }

  test("score_quantile_norm: per-source percentiles are rank-consistent and bounded") {
    val rows = q("score_quantile_norm").collect()
    assert(rows.length.toLong == Tables.documents(spark, sfDir).count())
    rows.groupBy(_.getString(1)).values.foreach { g =>
      val sorted = g.sortBy(r => (r.getLong(2), r.getLong(0)))
      val n = g.length.toLong
      sorted.zipWithIndex.foreach { case (r, idx) =>
        val exp = math.floor(idx.toDouble * 1e6 / math.max(n - 1, 1) + 0.5).toLong
        assert(r.getLong(3) == exp, s"doc ${r.getLong(0)} pct ${r.getLong(3)} != $exp")
      }
    }
  }

  test("containment_dedup is a superset of ngram_jaccard at the same tau; scores dominate") {
    val cont = q("containment_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    val jac = SparkEntry
      .queries("ngram_jaccard")(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    assert(jac.nonEmpty)
    jac.foreach { case (pair, j) =>
      assert(cont.contains(pair), s"jaccard pair $pair missing from containment set")
      // j is reported at 3 dp (can round UP by 5e-4); containment at 6 dp
      assert(cont(pair) + 6e-4 >= j, s"containment must dominate jaccard on $pair")
    }
  }

  test("centroid_shift matches driver-side centroid cosines from raw sums") {
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e4 + 0.5).toLong).toArray))
    val rows = q("centroid_shift").collect()
    rows.foreach { r =>
      val lbl = r.getInt(0)
      val a = vecs.filter(v => v._2 == lbl && v._1 % 2 == 0).map(_._3)
      val b = vecs.filter(v => v._2 == lbl && v._1 % 2 == 1).map(_._3)
      assert(r.getLong(1) == a.length.toLong && r.getLong(2) == b.length.toLong)
      val sa = (0 until 64).map(k => a.map(_(k)).sum).toArray
      val sb = (0 until 64).map(k => b.map(_(k)).sum).toArray
      val sab = (0 until 64).map(k => sa(k) * sb(k)).sum.toDouble
      val saa = (0 until 64).map(k => sa(k) * sa(k)).sum.toDouble
      val sbb = (0 until 64).map(k => sb(k) * sb(k)).sum.toDouble
      val exp = BigDecimal(sab / math.sqrt(saa * sbb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - exp) < 1e-9, s"label $lbl: ${r.getDouble(3)} != $exp")
    }
    assert(rows.length == 10, "one row per label")
  }

  test("incremental_knn: batch-only sources, corpus-only neighbors, radius respected") {
    val rows = q("incremental_knn").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 7 == 0, "sources must be the ingest batch")
      assert(r.getLong(2) % 7 != 0, "neighbors must be the standing corpus")
      assert(r.getLong(3) <= 3L)
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val ranks = g.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length))
    }
  }

  test("media_near_dup pairs share real frame windows; exact dups share all frames") {
    val rows = q("media_near_dup").collect()
    val txt = texts.map { case (id, ws) => id -> ws.mkString(" ") }.toMap
    def frames(t: String): Seq[String] =
      (0 until t.length / 64 by 2).map(i => t.substring(i * 64, i * 64 + 64))
    rows.foreach { r =>
      val (da, db, shared, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val fa = frames(txt(da))
      val fb = frames(txt(db))
      assert(na == fa.length.toLong && nb == fb.length.toLong)
      // shared of the hash join >= exact shared-window count (hash is
      // injective on this fixture, so they should be equal)
      val inter = fa.zipWithIndex.count { case (f, _) => fb.contains(f) }
      assert(shared >= 1L && inter >= 1, s"pair ($da,$db) shares no real frame window")
    }
    // exact text duplicates must appear with full frame agreement
    val dups = txt.toSeq.groupBy(_._2).values.filter(_.size >= 2)
    dups.foreach { g =>
      val ids = g.map(_._1).sorted
      for (a <- ids; b <- ids if a < b if frames(txt(a)).nonEmpty) {
        val hit = rows.find(r => r.getLong(0) == a && r.getLong(1) == b)
        assert(hit.isDefined, s"exact dup pair ($a,$b) missing")
        assert(hit.get.getLong(2) >= frames(txt(a)).length.toLong)
      }
    }
  }

  test("winsorize_values: clamping narrows the mean toward the band, never widens") {
    val rows = q("winsorize_values").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo + hi <= n)
      // p05/p95 clamps bound the tails at ~5% each (interpolated, so ≤ ceil)
      assert(lo <= n / 20 + 1 && hi <= n / 20 + 1, s"clamp counts implausible: $lo/$hi of $n")
      // winsorized mean lies within [min-clamped, max-clamped] of raw mean's band:
      // clamping can only pull the mean toward the band, so the two means differ
      // by at most the tail mass — sanity: both finite and same order of magnitude
      assert(!r.getDouble(4).isNaN && !r.getDouble(5).isNaN)
    }
  }

  test("wow_growth reconciles with a driver-side weekly recount") {
    val rows = q("wow_growth").collect()
    assert(rows.length > 1, "fixture spans multiple weeks")
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, sfDir).count())
    // growth_ppm recomputes from consecutive ns; first row NULL
    assert(rows.head.isNullAt(3))
    rows.sliding(2).foreach {
      case Array(p, c) =>
        val exp = math.floor((c.getLong(1) - p.getLong(1)).toDouble * 1e6 / p.getLong(1) + 0.5).toLong
        assert(c.getLong(3) == exp)
      case _ =>
    }
  }

  test("join_size_audit predicts the exact join cardinality") {
    val row = q("join_size_audit").head
    val actual = Tables
      .orders(spark, sfDir)
      .join(
        Tables.events(spark, sfDir).select(col("user_id")),
        col("o_custkey") === col("user_id"),
      )
      .count()
    assert(row.getLong(1) == actual, s"predicted ${row.getLong(1)} != actual $actual join rows")
    assert(row.getLong(0) <= math.min(row.getLong(3), row.getLong(4)))
    assert(row.getLong(2) <= row.getLong(1))
  }

  test("null_profile reconciles with per-column recounts") {
    val rows = q("null_profile").collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("user_id", "event_type", "value"))
    val ev = Tables.events(spark, sfDir)
    val n = ev.count()
    rows.values.foreach(r => assert(r.getLong(1) == n))
    assert(rows("event_type").getLong(3) == ev.select("event_type").distinct().count())
    assert(rows("user_id").getLong(3) == ev.select("user_id").distinct().count())
    rows.values.foreach(r => assert(r.getLong(2) == 0L, "fixture has no nulls"))
  }

  test("rolling_active_users matches a driver-side trailing-window recount") {
    val du = Tables
      .events(spark, sfDir)
      .select(
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"),
        col("user_id"),
      )
      .distinct()
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val days = du.map(_._1).distinct.sorted
    val expected = days.map { wd =>
      wd -> du.collect { case (d, u) if d >= wd - 6 && d <= wd => u }.distinct.length.toLong
    }.toMap
    val rows = q("rolling_active_users").collect()
    assert(rows.length == days.length, "one window per observed day")
    rows.foreach { r =>
      val wd = java.time.LocalDate.parse(r.getString(0)).toEpochDay.toInt
      assert(r.getLong(1) == expected(wd), s"window ${r.getString(0)}: ${r.getLong(1)} != ${expected(wd)}")
    }
  }

  test("boilerplate_prefixes: every reported prefix really heads >= 2 docs of that source") {
    val bySource = Tables
      .documents(spark, sfDir)
      .select("source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").take(2).mkString(" ")))
      .groupBy(identity)
      .view
      .mapValues(_.length.toLong)
      .toMap
    val rows = q("boilerplate_prefixes").collect()
    rows.foreach { r =>
      assert(bySource((r.getString(0), r.getString(1))) == r.getLong(2))
      assert(r.getLong(2) >= 2L)
    }
    assert(rows.length == bySource.count(_._2 >= 2), "no duplicate group may be missed")
  }
}
