package graft

import org.apache.spark.sql.functions._

/** Cross-checks between the approximate (MinHash/SimHash/LSH) and exact
  * (Jaccard / brute-force cosine) formulations on the real testdata.
  */
class DedupSimilaritySpec extends SparkSpec {

  private lazy val exactPairs: Map[(Long, Long), Double] =
    SparkEntry
      .queries("ngram_jaccard")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) -> r.getAs[Double]("j"))
      .toMap

  test("ngram_jaccard finds the planted near-dup pairs with high similarity") {
    assert(exactPairs.nonEmpty)
    assert(exactPairs.values.forall(_ >= 0.3))
    assert(exactPairs.values.max >= 0.9, "planted near-dups should score >= 0.9")
  }

  test("minhash candidates with high est_j are real near-dups") {
    val mh = SparkEntry
      .queries("minhash_near_dup")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) -> r.getAs[Double]("est_j"))
      .toMap
    val confident = mh.filter(_._2 >= 0.75).keySet
    assert(confident.nonEmpty)
    // every high-signature-agreement candidate is a true >= 0.3 jaccard pair
    assert(confident.subsetOf(exactPairs.keySet))
    // and minhash recalls most of the exact near-dup set (banding is probabilistic)
    val recall = exactPairs.keySet.count(mh.contains).toDouble / exactPairs.size
    assert(recall >= 0.8, s"minhash recall $recall too low")
  }

  test("simhash pairs are exactly the hamming<=4 pairs and cover planted dups") {
    val sh = SparkEntry
      .queries("simhash_near_dup")(spark, sfDir)
      .collect()
      .map(r => ((r.getAs[Long]("da"), r.getAs[Long]("db")), r.getAs[Long]("hd")))
    assert(sh.nonEmpty)
    assert(sh.forall(_._2 <= 4))
    val shPairs = sh.map(_._1).toSet
    val recall = exactPairs.keySet.count(shPairs.contains).toDouble / exactPairs.size
    assert(recall >= 0.8, s"simhash recall $recall too low")
  }

  test("cosine_topk is correctly ranked and bounded") {
    val rows = SparkEntry.queries("cosine_topk")(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "sims must be descending")
      assert(sims.forall(s0 => s0 >= -1.0001 && s0 <= 1.0001))
    }
  }

  test("LSH ANN results are a subset-quality answer vs brute force") {
    val exact = SparkEntry
      .queries("cosine_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view
      .mapValues(_.map(_.getAs[Double]("sim")).max)
      .toMap
    val lsh = SparkEntry.queries("cosine_lsh_ann")(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    lsh.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.forall(_.getAs[Long]("code_hd") <= 3))
      // no LSH hit can beat the exact top-1
      assert(rs.forall(_.getAs[Double]("sim") <= exact(q) + 1e-9))
    }
  }

  test("incremental near-dup equals the full run restricted to the new batch") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    // split: ids >= 400 arrive as the "new batch"
    val corpus = docs.filter(col("doc_id") < 400)
    val fresh = docs.filter(col("doc_id") >= 400)
    val inc = graft.operators.DedupOps
      .nearDupsAgainst(corpus, fresh, minJ = 0.3)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("other_id"),
        math.min(r.getAs[Long]("new_id"), r.getAs[Long]("other_id")) ->
          math.max(r.getAs[Long]("new_id"), r.getAs[Long]("other_id"))))
      .map(_._3)
      .toSet
    val full = SparkEntry
      .queries("ngram_jaccard")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
      .filter { case (a, b) => a >= 400 || b >= 400 }
      .toSet
    assert(inc == full, s"incremental=${inc.size} full-restricted=${full.size}")
    assert(inc.nonEmpty, "split must cross at least one planted near-dup pair")
  }

  test("dedup_clusters: connected components are transitive and min-labeled") {
    val labels = SparkEntry
      .queries("dedup_clusters")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    val pairs = SparkEntry.queries("ngram_jaccard")(spark, sfDir).collect()
    assert(pairs.nonEmpty, "need near-dup pairs for clustering to mean anything")
    // both endpoints of every near-dup pair share a cluster (transitivity
    // is implied: the pair relation's closure IS the component)
    pairs.foreach { p =>
      assert(labels(p.getAs[Long]("da")) == labels(p.getAs[Long]("db")))
    }
    // a cluster is labeled by its minimum member, and members agree on it
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keysIterator.min == cid, s"cluster $cid not min-labeled")
    }
    // docs with no pair stay singletons
    val inPairs =
      pairs.flatMap(p => Seq(p.getAs[Long]("da"), p.getAs[Long]("db"))).toSet
    labels.foreach { case (doc, cid) =>
      if (!inPairs(doc)) assert(cid == doc, s"singleton $doc relabeled to $cid")
    }
  }

  test("no near-dup pair straddles the leakage-safe train/val split") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val split = SparkEntry.queries("leakage_safe_split")(spark, d).select("doc_id", "split")
    val pairs = SparkEntry.queries("ngram_jaccard")(spark, d).select("da", "db")
    val straddling = pairs
      .join(
        split.withColumnRenamed("doc_id", "da").withColumnRenamed("split", "sa"),
        Seq("da"),
      )
      .join(
        split.withColumnRenamed("doc_id", "db").withColumnRenamed("split", "sb"),
        Seq("db"),
      )
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0, s"$straddling near-dup pairs leak across the split")
    val counts = split
      .groupBy("split")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(counts.getOrElse("train", 0L) > 0 && counts.getOrElse("val", 0L) > 0,
      s"both sides must be populated: $counts")
  }

  test("simhash_est contains the production threshold as its hd<=4 slice, calibrated") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val est = SparkEntry.queries("simhash_est")(spark, d).cache()
    try {
      // the hd<=4 slice IS simhash_near_dup (shared banding, wider bound);
      // compared as collected sets — both frames share the cached signature
      // substrate's lineage, and a DataFrame-level except over the shared
      // attribute ids trips Catalyst's self-join ambiguity
      val prod = SparkEntry
        .queries("simhash_near_dup")(spark, d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val slice = est
        .filter(col("hd") <= 4)
        .select("da", "db", "hd")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(slice == prod,
        "hd<=4 slice of the calibration must equal the declared near-dup set")
      // est_s is the stated pure function of hd
      val badEst = est
        .filter(col("est_s") =!= expr("CAST(floor((30 - hd) / 30.0 * 10000.0 + 0.5) / 10000.0 AS DOUBLE)"))
        .count()
      assert(badEst == 0)
      // calibration direction: close-in-hamming pairs are more similar in
      // exact Jaccard than far ones, on average (the curve the threshold
      // is tuned against must actually slope)
      val means = est
        .withColumn("g", when(col("hd") <= 4, "near").otherwise("far"))
        .groupBy("g")
        .agg(avg("exact_j").as("mj"))
        .collect()
        .map(r => r.getString(0) -> r.getDouble(1))
        .toMap
      assert(means.contains("near") && means.contains("far"), s"need both regimes: $means")
      assert(means("near") > means("far"),
        s"mean exact Jaccard must decrease with hamming distance: $means")
    } finally est.unpersist()
  }

  test("source_overlap conserves the pair count: every near-dup pair lands in one cell") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val cells = SparkEntry.queries("source_overlap")(spark, d).collect()
    assert(cells.nonEmpty, "fixture must produce a non-trivial overlap matrix")
    cells.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "cells must be unordered (s1 <= s2)")
      assert(r.getAs[Long]("dup_pairs") > 0L)
    }
    val total = cells.map(_.getAs[Long]("dup_pairs")).sum
    val pairs = SparkEntry.queries("ngram_jaccard")(spark, d).count()
    assert(total == pairs,
      s"matrix total ($total) must equal the near-dup pair count ($pairs)")
  }

  test("jaccard_threshold_sweep: full grid, non-increasing, anchored at the declared query") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry
      .queries("jaccard_threshold_sweep")(spark, d)
      .collect()
      .map(r => r.getDouble(0) -> r.getAs[Long]("pairs"))
    assert(rows.map(_._1).toSeq == Seq(0.3, 0.5, 0.7, 0.9), "every grid row must emit")
    assert(rows.sliding(2).forall { case Array((_, a), (_, b)) => a >= b },
      s"survivor counts must be non-increasing in the threshold: ${rows.toSeq}")
    // the 0.3 row is exactly the declared ngram_jaccard pair count
    val base = SparkEntry.queries("ngram_jaccard")(spark, d).count()
    assert(rows.head._2 == base, s"sweep(0.3)=${rows.head._2} != ngram_jaccard $base")
  }
}
