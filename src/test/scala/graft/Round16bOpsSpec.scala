package graft

import org.apache.spark.sql.functions._

/** Second round-16 block: gap-grain merge associativity beyond the one
  * streaming split, and the PRF pair's (rm3_expansion / rocchio_rerank)
  * structural invariants.
  */
class Round16bOpsSpec extends SparkSpec {

  test("gap-grain merge is exact under ANY time-contiguous slicing (3 different cuts)") {
    // The streaming suite proves one 3-way split end-to-end; this pins
    // the algebra directly: for several different cut sets, slicing the
    // events by time, building per-slice parts, and merging must equal
    // the one-part merge (= the batch per-user moments) EXACTLY.
    val ev = Tables.events(spark, sfDir)
    val b = ev.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"),
    ).collect()(0)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq.toSet
    val onePart = canon(
      operators.TemporalOps.mergeGapGrain(operators.TemporalOps.gapGrainParts(ev)))
    assert(onePart.nonEmpty)
    val cutSets: Seq[Seq[Long]] = Seq(
      Seq(lo + (hi - lo) / 2), // halves
      Seq(lo + (hi - lo) / 10, lo + 9 * (hi - lo) / 10), // thin edges
      (1 to 4).map(i => lo + i * (hi - lo) / 5), // five slices
    )
    cutSets.foreach { cuts =>
      val bounds = (Seq(lo - 1) ++ cuts) zip (cuts ++ Seq(hi))
      val parts = bounds
        .map { case (a, c) =>
          operators.TemporalOps.gapGrainParts(
            ev.filter(unix_micros(col("ts")) > a && unix_micros(col("ts")) <= c))
        }
        .reduce(_ unionByName _)
      assert(canon(operators.TemporalOps.mergeGapGrain(parts)) == onePart,
        s"merge must be exact for cuts $cuts")
    }
  }

  test("rm3_expansion surfaces a valid reranking: ranks contiguous, base ranks honest") {
    val rm3 = SparkEntry.queries("rm3_expansion")(spark, sfDir).collect()
    assert(rm3.length == 10)
    assert(rm3.map(_.getLong(2)).toSeq == (1L to 10L), "rank_rm3 must be 1..10")
    // base_rank values must MATCH bm25_rank's published top-20 ranking
    val base = SparkEntry.queries("bm25_rank")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rm3.foreach { r =>
      val (doc, br) = (r.getLong(0), r.getLong(3))
      if (br == 0L) assert(!base.contains(doc), s"doc $doc claims new but is in base top-20")
      else assert(base(doc) == br, s"doc $doc base_rank $br != bm25 rank ${base(doc)}")
    }
    // scores strictly ordered under the full-key tiebreak
    val scores = rm3.map(r => (r.getLong(1), r.getLong(0)))
    assert(scores.sortBy { case (s, d) => (-s, d) }.toSeq == scores.toSeq,
      "rm3 output must be ordered by (score desc, doc_id)")
  }

  test("rocchio_rerank moves the ranking but keeps the exact-integer ordering contract") {
    val roc = SparkEntry.queries("rocchio_rerank")(spark, sfDir).collect()
    assert(roc.length == 10)
    assert(roc.map(_.getLong(2)).toSeq == (1L to 10L), "rank_roc must be 1..10")
    val scores = roc.map(r => (r.getLong(1), r.getLong(0)))
    assert(scores.sortBy { case (s, d) => (-s, d) }.toSeq == scores.toSeq,
      "rocchio output must be ordered by (score desc, vec_id)")
    // the feedback list is the int-dot top-10: any doc with base_rank>0
    // must carry a rank in 1..10 and the query vector itself never appears
    roc.foreach { r =>
      assert(r.getLong(0) != 0L, "the query vector must not rank itself")
      val br = r.getLong(3)
      assert(br >= 0L && br <= 10L, s"base_rank $br out of range")
    }
  }

  test("seasonal_forecast composes the shared Holt level/trend with a bounded dow offset") {
    val sea = SparkEntry.queries("seasonal_forecast")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    val holt = SparkEntry.queries("holt_forecast")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(sea.keySet == holt.keySet && sea.nonEmpty)
    sea.foreach { case (t, (level, trend, season, fc)) =>
      assert((level, trend) == holt(t), s"$t: level/trend must be the shared Holt values")
      assert(fc == level + trend + season, s"$t: forecast must be the additive composition")
    }
  }
}
