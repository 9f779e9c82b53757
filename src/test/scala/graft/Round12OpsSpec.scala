package graft

import org.apache.spark.sql.functions._

/** Round-12 invariants: (1) the CovMomentsAggregator overflow property
  * tested ON the shipped Aggregator itself (round 11's test exercised
  * `df.agg(sum(...))`, which ANSI guards — the Aggregator's JVM Long
  * arithmetic is NOT ANSI-guarded and silently wrapped until the
  * round-12 `Math.addExact` fix); (2) the DECIMAL(38) wide tier
  * extended to `table_checksum` and `user_type_entropy` — parity in
  * range, loud BIGINT failure at adversarial magnitude; (3) the
  * empty-corpus short-circuit of the covariance Aggregator path.
  */
class Round12OpsSpec extends SparkSpec {

  test("CovMomentsAggregator itself throws on Long overflow — no silent wrap") {
    // Adversarial magnitudes fed straight into reduce/merge: q values of
    // ~3e9 make a single product ~9e18 ≈ Long.MaxValue, so the second
    // accumulation MUST overflow. The claim under test is about the
    // failure MODE: ArithmeticException, never a wrapped finite buffer.
    val dim = 2
    val agg = new functions.CovMomentsAggregator(dim)
    val big = 3L * 1000L * 1000L * 1000L // 3e9; big*big = 9e18 < 2^63-1
    val v = Seq(big, big)
    val one = agg.reduce(agg.zero, v) // in range: 9e18 fits once
    val reduceOutcome = intercept[ArithmeticException] {
      agg.reduce(one, v) // 1.8e19 > Long.MaxValue
    }
    assert(reduceOutcome.getMessage.toLowerCase.contains("overflow"))
    // merge must hold the same property (partial buffers combine there)
    val other = agg.reduce(agg.zero, v)
    intercept[ArithmeticException] { agg.merge(one, other) }
    ()
  }

  test("CovMomentsAggregator stays exact at the edge of range (no false throws)") {
    // Just-under-the-bound accumulation must still be exact: quantized
    // unit vectors (|q| ≤ 10^4+) over many rows — the real workload
    // shape — summed against a BigInteger oracle.
    val dim = 3
    val agg = new functions.CovMomentsAggregator(dim)
    val vecs = (1 to 500).map(i => Seq(i.toLong * 7L, -i.toLong * 3L, 10000L - i))
    val buf = vecs.foldLeft(agg.zero)(agg.reduce)
    val (first, prods, n) = agg.finish(buf)
    assert(n == 500L)
    def oracleFirst(k: Int) = vecs.map(_(k)).sum
    assert((0 until dim).forall(k => first(k) == oracleFirst(k)))
    var pos = 0
    for (i <- 0 until dim; j <- i until dim) {
      val expect = vecs.map(v => v(i) * v(j)).sum
      assert(prods(pos) == expect, s"cell ($i,$j)")
      pos += 1
    }
  }

  test("empty embeddings corpus: the Aggregator covariance path yields 0 rows, not NaN rows") {
    // A global typed Aggregator always returns its zero; without the
    // n==0 short-circuit the moment decode fabricated 64+2080 rows of
    // 0/0 — diverging from the grouped oracle's empty result.
    val dir = java.nio.file.Files.createTempDirectory("empty-emb").toString
    Tables
      .embeddings(spark, sfDir)
      .limit(0)
      .write
      .parquet(s"$dir/embeddings.parquet")
    assert(operators.SimilarityOps.covarianceMoments(spark, dir, wide = false).count() == 0L,
      "empty corpus must produce an empty covariance frame on the declared path")
  }

  test("wide (DECIMAL 38) table_checksum equals the BIGINT path exactly") {
    val narrow = operators.ScalePatterns
      .tableChecksumFrame(spark, sfDir, wide = false)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val wide = operators.ScalePatterns
      .tableChecksumFrame(spark, sfDir, wide = true)
      .select(col("o_orderpriority"), col("n"),
        col("checksum_sum").cast("long"), col("checksum_xor"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(narrow.nonEmpty && wide == narrow,
      "DECIMAL(38) checksum accumulation must reproduce the BIGINT digests in range")
  }

  test("wide (DECIMAL 38) user_type_entropy equals the BIGINT path exactly") {
    val narrow = operators.TemporalOps
      .userTypeEntropyFrame(spark, sfDir, wide = false)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val wide = operators.TemporalOps
      .userTypeEntropyFrame(spark, sfDir, wide = true)
      .select(col("user_id"), col("n").cast("long"), col("k_types"), col("entropy_e6"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(narrow.nonEmpty && wide == narrow,
      "DECIMAL(38) entropy accumulation must reproduce the BIGINT path in range")
  }

  test("the checksum/entropy BIGINT tier fails loudly at Long scale; DECIMAL holds") {
    import spark.implicits._
    // The knob's reason, restated at the two new sites' accumulator
    // shape: Σ of near-Long addends (a 100 TB hot group's worth of
    // ~2^31 row hashes, or ~2e16 µnat terms from 10^9-event users).
    val v = (Long.MaxValue / 10L) * 9L
    val df = Seq(v, v, v, v).toDF("x")
    val truth = java.math.BigInteger.valueOf(v).multiply(java.math.BigInteger.valueOf(4L))
    val wideSum = df.agg(sum($"x".cast("decimal(38,0)"))).collect()(0).getDecimal(0)
    assert(wideSum.toBigInteger == truth)
    // The loud-failure guarantee is an ANSI-mode property; a session
    // with ANSI off would wrap silently, which is exactly the behavior
    // the wide-tier docs rule out — so the test REQUIRES the exception,
    // it does not accept a wrong finite sum as an alternate pass.
    assert(spark.conf.get("spark.sql.ansi.enabled").toBoolean,
      "wide-tier loud-failure tests must run under ANSI mode")
    val e = intercept[Throwable] { df.agg(sum($"x")).collect() }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain.exists(_.toString.toLowerCase.contains("overflow")),
      s"BIGINT sum past Long.MaxValue must fail with an overflow error, got: $e")
  }

  test("sketch twins track their exact dashboards within linear-counting error") {
    // n ≈ 150 users against m = 8192 registers: the linear-counting
    // standard error is ~sqrt(m·(exp(n/m) − n/m − 1))/n < 1% here, so a
    // 5%+3 envelope is loose enough to never flake and tight enough to
    // catch a broken hash chain or estimate formula instantly.
    for (name <- Seq("rolling_active_sketch", "cumulative_unique_sketch")) {
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name must produce rows")
      rows.foreach { r =>
        val est = r.getLong(2)
        val exact = r.getLong(3)
        assert(math.abs(est - exact) <= 0.05 * exact + 3,
          s"$name ${r.get(0)}: est $est vs exact $exact drifted past the error envelope")
      }
    }
  }

  test("wide tiers leave the plan family unchanged: one partial+final agg, no extra exchange") {
    // The knob swaps an accumulator TYPE, not the plan: the wide
    // checksum must still be a single partial+final hash agg over the
    // scan (count the exchanges), or the 100 TB argument for flipping
    // it would be false.
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val n = exchanges(operators.ScalePatterns.tableChecksumFrame(spark, sfDir, wide = false))
    val w = exchanges(operators.ScalePatterns.tableChecksumFrame(spark, sfDir, wide = true))
    assert(n == w, s"wide tier added exchanges: $n narrow vs $w wide")
  }
}
