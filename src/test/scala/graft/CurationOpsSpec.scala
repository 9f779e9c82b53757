package graft

import org.apache.spark.sql.functions._

/** The claimed invariants of the curation queries, pinned beyond the
  * oracle gate: `corpus_shuffle`'s whole point is DETERMINISM (identical
  * order at any partitioning — what `orderBy(rand())` cannot give), and
  * `ngram_novelty`'s scaladoc claims an auditable conservation law
  * (first-occurrence credit lands exactly once per gram).
  */
class CurationOpsSpec extends SparkSpec {

  test("corpus_shuffle is deterministic across re-runs, dense per shard, and balanced") {
    val d = "/root/testdata/sf0.01"
    def run(): Seq[(Long, Long, Long)] =
      SparkEntry
        .queries("corpus_shuffle")(spark, d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    val base = run()
    // the assignment is a pure row function + per-shard rank on a unique
    // key, so a repartitioned re-run must reproduce it bit-for-bit
    val again = run()
    assert(base == again, "re-run must be identical")
    // ranks are dense 1..n within every shard
    val byShard = base.groupBy(_._2)
    for ((shard, rows) <- byShard) {
      val ords = rows.map(_._3).sorted
      assert(ords == (1L to rows.size.toLong), s"shard $shard ranks must be dense from 1")
    }
    // avalanche balance: no shard takes more than 2x its fair share
    val n = base.size
    val fair = n.toDouble / byShard.size
    for ((shard, rows) <- byShard)
      assert(rows.size < 2 * fair, s"shard $shard holds ${rows.size} of $n — hash not mixing")
    // and the order is NOT the identity order (it actually shuffles)
    assert(base.sortBy(t => (t._2, t._3)).map(_._1) != base.map(_._1).sorted,
      "shuffled order must differ from doc_id order")
  }

  test("ngram_novelty conserves first-occurrence credit: sum(novel) = distinct gram count") {
    val d = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("ngram_novelty")(spark, d)
    val novelSum = out.agg(sum("novel")).head().getLong(0)
    val distinctGrams = graft.operators.DedupOps
      .gramRowsOf(Tables.documents(spark, d))
      .select("gh")
      .distinct()
      .count()
    assert(novelSum == distinctGrams,
      s"every gram's first occurrence must be credited exactly once: $novelSum vs $distinctGrams")
    // novelty is a valid ratio and the fixture exercises both regimes
    val range = out.agg(min("novelty"), max("novelty")).head()
    assert(range.getDouble(0) >= 0.0 && range.getDouble(1) <= 1.0)
    assert(range.getDouble(0) < range.getDouble(1), "fixture must spread novelty scores")
  }

  test("dsir_weights actually separates: target-slice docs outscore the raw pool on average") {
    // the importance weight's whole point is that docs drawn from the
    // target distribution score higher — if the means don't separate,
    // the estimator is broken even when the arithmetic oracle-matches
    val scored = SparkEntry
      .queries("dsir_weights")(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir).select("doc_id", "lang"), Seq("doc_id"))
    val means = scored
      .groupBy(col("lang") === "en")
      .agg(avg(col("weight_sum").cast("double") / col("n_feats")).as("m"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1))
      .toMap
    assert(means(true) > means(false),
      s"mean per-feature weight must favor the target slice: ${means(true)} vs ${means(false)}")
  }

  test("token_budget_mix fills to the budget exactly: crossing doc included, next doc cut") {
    val out = SparkEntry.queries("token_budget_mix")(spark, sfDir).collect()
    val budget = 2000L
    val byLang = out.groupBy(_.getString(0))
    for ((lang, rows) <- byLang) {
      val last = rows.maxBy(_.getLong(3)) // cum_words
      val total = last.getLong(3)
      // the kept prefix crosses the budget (crossing doc included)...
      assert(total >= budget, s"$lang: kept prefix must reach the budget, got $total")
      // ...but only because of the final doc — removing it goes under
      assert(total - last.getLong(2) < budget,
        s"$lang: the doc before the crossing one must still be under budget")
    }
    assert(byLang.keySet == Set("en", "de", "es", "fr", "zh"), "every slice contributes")
  }

  test("curation_funnel is monotone and its final stage equals clean_corpus") {
    val d = "/root/testdata/sf0.01"
    val funnel = SparkEntry
      .queries("curation_funnel")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    assert(funnel.keySet == Set(1L, 2L, 3L, 4L))
    assert(funnel(1L) >= funnel(2L) && funnel(2L) >= funnel(3L) && funnel(3L) >= funnel(4L),
      s"funnel must be monotone decreasing: $funnel")
    assert(funnel(1L) > funnel(4L), "the fixture must exercise every cut")
    val clean = SparkEntry.queries("clean_corpus")(spark, d).count()
    assert(funnel(4L) == clean, s"report (${funnel(4L)}) != pipeline ($clean)")
  }

  test("vocab_js_divergence: en-vs-en is exactly 0, every other slice diverges, bound holds") {
    val out = SparkEntry
      .queries("vocab_js_divergence")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val byLang = out.map(t => t._1 -> t).toMap
    assert(byLang("en")._2 == 0L, "the self-divergence must be exactly 0 (scaled integer)")
    for ((lang, scaled, js) <- out if lang != "en") {
      assert(scaled > 0L, s"$lang must diverge from the target slice")
      assert(js > 0.0 && js <= math.log(2.0) + 1e-6, s"$lang: JS out of [0, ln 2]: $js")
    }
  }

  test("perplexity_bucket terciles are balanced and ordered by surprisal") {
    val out = SparkEntry.queries("perplexity_bucket")(spark, sfDir).collect()
    val sizes = out.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1, s"ntile balance: $sizes")
    // bucket boundaries respect the score order: max(head) <= min(tail)
    val head = out.filter(_.getLong(2) == 1L).map(_.getDouble(1))
    val tail = out.filter(_.getLong(2) == 3L).map(_.getDouble(1))
    assert(head.max <= tail.min, "tercile ordering must follow mean_surprisal")
  }

  test("gopher_rules: keep is exactly the conjunction and discriminates") {
    val df = SparkEntry.queries("gopher_rules")(spark, sfDir).cache()
    try {
      val bad = df
        .filter(
          col("keep") =!= (col("r_words") && col("r_mean_len") && col("r_stop") && col("r_alpha")),
        )
        .count()
      assert(bad == 0, "keep must equal the AND of the four rules")
      val kept = df.filter(col("keep")).count()
      val total = df.count()
      assert(kept > 0 && kept < total, s"rules must discriminate: kept $kept of $total")
      // every doc in this corpus is pure lowercase words — the alpha rule
      // must never be the one that fires
      assert(df.filter(!col("r_alpha")).count() == 0)
    } finally df.unpersist()
  }

  test("source_reputation: blocked = below-corpus-mean, both classes present") {
    val df = SparkEntry.queries("source_reputation")(spark, sfDir).cache()
    try {
      val rows = df.collect()
      val gDocs = rows.map(_.getAs[Long]("n_docs")).sum
      val gUniq = rows.map(_.getAs[Long]("sum_uniq")).sum
      rows.foreach { r =>
        val expect = r.getAs[Long]("sum_uniq") * gDocs < gUniq * r.getAs[Long]("n_docs")
        assert(r.getAs[Boolean]("blocked") == expect, s"cross-multiply mismatch for ${r}")
      }
      val blocked = rows.count(_.getAs[Boolean]("blocked"))
      assert(blocked > 0 && blocked < rows.length, "below-mean split must be non-trivial")
    } finally df.unpersist()
  }

  test("temperature_mix: rarest language keeps everything; rates anti-monotone in count") {
    val cnts = Tables
      .documents(spark, sfDir)
      .groupBy("lang")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val thr = SparkEntry
      .queries("temperature_mix")(spark, sfDir)
      .select("lang", "thr")
      .distinct()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val rarest = cnts.minBy(_._2)._1
    assert(thr(rarest) == 1000000L, s"rarest lang ($rarest) must keep rate 1.0, got ${thr(rarest)}")
    // p^(α-1) with α<1 is decreasing in p: a bigger slice never gets a
    // higher keep-rate than a smaller one
    for {
      (l1, c1) <- cnts; (l2, c2) <- cnts
      if c1 < c2 && thr.contains(l1) && thr.contains(l2)
    } assert(thr(l1) >= thr(l2), s"rate($l1, n=$c1) < rate($l2, n=$c2)")
    // α = 0.5 smooths but must not flatten: the biggest slice is still
    // sampled below rate 1
    val biggest = cnts.maxBy(_._2)._1
    assert(thr(biggest) < 1000000L)
  }

  test("temperature_mix kept set is exactly the stated hash predicate (partition-independent)") {
    // the determinism claim: the kept set is a pure row function of
    // (doc_id, lang, thr) — recompute it driver-side from the doc list
    // and the query's own thresholds; any partitioning/shuffle change in
    // the plan cannot move it
    val out = SparkEntry
      .queries("temperature_mix")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val thr = out.map(t => t._2 -> t._4).toMap
    val docs = Tables
      .documents(spark, sfDir)
      .select("doc_id", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.collect {
      case (id, lang) if thr.contains(lang) && math.floorMod(id * 2654435761L, 1000000L) < thr(lang) =>
        (id, lang, math.floorMod(id * 2654435761L, 1000000L), thr(lang))
    }.toSet
    assert(out.toSet == expected, "kept rows must equal the driver-side predicate replay")
    // bucket column really is the stated hash
    out.foreach { case (id, _, bucket, _) =>
      assert(bucket == math.floorMod(id * 2654435761L, 1000000L))
    }
  }

  test("token_fertility: every word is >= 1 token and merges actually compress") {
    val rows = SparkEntry.queries("token_fertility")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val nTokens = r.getAs[Long]("n_tokens")
      val nChars = r.getAs[Long]("n_chars")
      assert(nTokens >= nWords, "a word cannot encode to zero tokens")
      assert(nTokens <= nChars, "merges can never produce more tokens than characters")
      assert(r.getAs[Double]("fertility") >= 1.0)
      val bpt = r.getAs[Double]("bytes_per_token")
      assert(bpt >= 1.0, s"bytes/token < 1 is impossible, got $bpt")
      // the shipped 10-merge model must compress below the char ceiling
      assert(nTokens < nChars, "with 10 merges over this vocab, some fusion must happen")
    }
  }
}
