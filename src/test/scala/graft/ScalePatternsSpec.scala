package graft

import org.apache.spark.sql.functions._
import graft.operators.ScalePatterns

/** Plan-level proofs for the 100 TB join patterns: bucketed joins are
  * exchange-free; salted joins equal plain joins and actually flatten the
  * skewed key's partition distribution.
  */
class ScalePatternsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ScalePatterns.writeBucketed(
        Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
        "orders_b", "o_orderkey", 8,
      )
      ScalePatterns.writeBucketed(
        Tables
          .lineitem(spark, sfDir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(sum("l_quantity").as("qty")),
        "lineagg_b", "o_orderkey", 8,
      )
      val joined = ScalePatterns.bucketedJoin(spark, "orders_b", "lineagg_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = Tables
        .orders(spark, sfDir)
        .join(
          Tables.lineitem(spark, sfDir).groupBy(col("l_orderkey")).agg(sum("l_quantity").as("qty")),
          col("o_orderkey") === col("l_orderkey"),
        )
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals the plain join and flattens the hot key") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 90% of rows share one key — the pathological shuffle-join shape
      val big = spark
        .range(0, 20000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"), col("id").as("payload"))
      val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "attr")

      val plain = big.join(small, Seq("k"))
      val salted = ScalePatterns.saltedJoin(big, small, "k", salts = 8)
      assert(salted.count() == plain.count())
      assert(
        salted.agg(sum(col("payload"))).head.getLong(0) ==
          plain.agg(sum(col("payload"))).head.getLong(0),
      )

      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long = {
        val sizes = df
          .repartition(8, col("k"), col("__salt_probe"))
          .rdd
          .mapPartitions(it => Iterator(it.size.toLong))
          .collect()
        sizes.max
      }
      // partition the joined output the way the join shuffles it:
      // plain = by key only (hot key lands on one partition);
      // salted = by (key, salt) — spread over `salts` partitions.
      val plainMax = maxPartitionRows(plain.withColumn("__salt_probe", lit(0)))
      val saltedMax = maxPartitionRows(
        big
          .withColumn("__salt_probe", pmod(monotonically_increasing_id(), lit(8L)))
          .join(small.withColumn("__salt_probe", explode(sequence(lit(0L), lit(7L)))), Seq("k", "__salt_probe")),
      )
      assert(
        saltedMax * 2 < plainMax,
        s"salting must flatten the hot key: salted max $saltedMax vs plain max $plainMax",
      )
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    import org.apache.spark.sql.functions._
    // force the shuffle-join path (bloom filters don't apply to broadcasts)
    // and lower the creation thresholds to testdata size
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // testdata is far below the 10GB production probe-side threshold
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(spark, sfDir)
      val sel = Tables
        .orders(spark, sfDir)
        .filter(col("o_totalprice") > 500000) // selective build side
        .select("o_orderkey")
      val joined = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(
        plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        s"selective join must inject a runtime bloom filter:\n${plan.take(900)}",
      )
      // the filter is a pure pruning optimization — results are unchanged
      val expected = li
        .join(broadcast(sel), li("l_orderkey") === sel("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import org.apache.spark.sql.functions._
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // testdata-sized skew thresholds: a partition is "skewed" past 2KB
      // and 1× the median, split into ~1KB advisory chunks (production
      // leaves the 256MB/5× defaults — the MECHANISM is what's pinned)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      // collapse two thirds of the fact keys onto key 0 — a classic hot
      // key. The repartition(8) matters: AQE splits a skewed reduce
      // partition at MAP-OUTPUT boundaries, so the single-file testdata
      // scan (one mapper) must fan out before the join shuffle or the
      // hot partition is one indivisible chunk.
      val left = Tables
        .lineitem(spark, sfDir)
        .repartition(8)
        .select(
          when(col("l_orderkey") % 3 =!= 0, lit(0L)).otherwise(col("l_orderkey")).as("k"),
          col("l_quantity"),
        )
      val right = Tables
        .orders(spark, sfDir)
        .select(col("o_orderkey").as("k2"), col("o_totalprice"))
      val j = left.join(right, col("k") === col("k2"))
      // execute THIS DataFrame's QueryExecution (count() would plan a
      // separate query and leave j's adaptive plan unexecuted)
      assert(j.collect().nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark and split the hot partition:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("range-partitioned sorted write yields non-overlapping sorted files") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("sorted-layout").toString
    ScalePatterns.writeSortedByRange(Tables.orders(spark, sfDir), dir, "o_orderkey", 8)
    val ranges = spark.read
      .parquet(dir)
      .select(input_file_name().as("f"), col("o_orderkey"))
      .groupBy("f")
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.length > 1, "range partitioning must produce multiple files")
    ranges.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1, s"file ranges overlap: $a vs $b")
      case _ =>
    }
    // row counts stay balanced (±50%): range sampling absorbs key skew
    val ns = ranges.map(_._3)
    assert(ns.max <= math.max(2 * ns.min, 2L),
      s"sorted files should balance rows, got ${ns.toSeq}")
  }

  test("approx_count_distinct tracks the exact cardinality within its rsd bound") {
    import org.apache.spark.sql.functions._
    val row = Tables
      .events(spark, sfDir)
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"),
      )
      .collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    // HLL++ rsd 2%; allow 5σ
    assert(math.abs(approx - exact) <= math.max(1, math.ceil(5 * 0.02 * exact).toLong),
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile tracks the exact percentile within its accuracy bound") {
    import org.apache.spark.sql.functions._
    // the 100 TB knob: exact percentile shuffles every value to one
    // reducer per group; approx_percentile is a mergeable sketch
    // (partial+final agg) with a declared error bound
    val rows = Tables
      .events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("exact"),
        expr("approx_percentile(value, 0.5, 10000)").as("approx"),
        expr("min(value)").as("lo"),
        expr("max(value)").as("hi"),
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val span = r.getAs[Double]("hi") - r.getAs[Double]("lo")
      val err = math.abs(r.getAs[Double]("exact") - r.getAs[Double]("approx"))
      assert(err <= span * 0.01 + 1e-9, s"sketch drifted: $r")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime — salted_join's automatic tier") {
    // SCALE.md claims AQE's skew-join handles sort-merge skew
    // automatically and the explicit salt pattern covers what it can't;
    // this proves the first half EMPIRICALLY instead of by citation. A
    // fresh session (shared context, isolated conf) lowers the skew
    // thresholds to fixture scale and disables broadcast so the join
    // stays sort-merge; one key carries ~95% of the fact rows.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4k")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2k")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    // v is a hash-scrambled payload that survives into the aggregate, so
    // column pruning can't drop it and shuffle compression can't erase
    // the hot partition's bytes (constant keys alone compress to ~nothing)
    val facts = (0L until 20000L)
      .map(i => (if (i % 20L == 0L) i % 50L + 1L else 0L, i * 2654435761L % 1000000007L))
      .toDF("k", "v")
    val dim = (0L until 51L).map(i => (i, s"d$i")).toDF("k", "name")
    val joined = facts.join(dim, Seq("k")).groupBy("name")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("sv"))
    val result = joined.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    // after execution the adaptive plan is final — the skewed SMJ
    // partition must have been split
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(300))
    assert(plan.contains("skew=true"),
      s"expected a skew=true sort-merge join in the final adaptive plan:\n${plan.take(1500)}")
    // and splitting must not change the result: compare against the
    // explicitly-broadcast plan of the same join (broadcast() overrides
    // the -1 threshold, so no SMJ and no skew path)
    val expected = facts
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("k"))
      .groupBy("name")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("sv"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    assert(result == expected, "skew splitting must not change the joined result")
  }
}
