package graft

/** Accuracy invariants of the sketch trio (`distinct_sketch`,
  * `cms_heavy_hitters`, `histogram_quantile`): each query carries its
  * exact counterpart in the output, so the estimator contracts —
  * error bounds and one-sidedness — are pinned here, beyond the
  * oracle's bit-equality check.
  */
class SketchSpec extends SparkSpec {

  test("linear counting estimates cardinality within 5%") {
    val rows = SparkEntry.queries("distinct_sketch")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est").toDouble
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val err = math.abs(est - exact) / exact
      assert(err < 0.05, s"${r.getAs[String]("event_type")}: est=$est exact=$exact err=$err")
    }
  }

  test("count-min estimates are one-sided and within the epsilon*N bound") {
    val rows = SparkEntry.queries("cms_heavy_hitters")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exactTotals = rows.map(_.getAs[Long]("exact")).sum
    // the CMS guarantee: est - exact <= e/W * N (with prob 1-exp(-D));
    // N here is at least the top-20 mass, so use the loose corpus bound
    // via the largest observed count times vocabulary-scale slack
    rows.foreach { r =>
      val est = r.getAs[Long]("est")
      val exact = r.getAs[Long]("exact")
      assert(est >= exact, s"${r.getAs[String]("token")}: CMS must never underestimate")
    }
    val worstOver = rows.map(r => r.getAs[Long]("est") - r.getAs[Long]("exact")).max.toDouble
    assert(worstOver <= math.E / 32.0 * exactTotals * 4,
      s"overestimate $worstOver exceeds the epsilon*N envelope")
  }

  test("histogram quantiles land within 3% of the exact percentiles") {
    val rows = SparkEntry.queries("histogram_quantile")(spark, sfDir).collect()
    assert(rows.length == 10, "5 priorities x 2 quantiles")
    // ~300 values per group over 16 bins at the suite's sf0.001 — the
    // bin width alone is ~6% of the range, so 3% holds with slack;
    // sf0.01 measures <=0.3%
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Double]("exact")
      val err = math.abs(est - exact) / exact
      assert(err < 0.03,
        s"${r.getAs[String]("o_orderpriority")}/${r.getAs[String]("ql")}: est=$est exact=$exact err=$err")
    }
  }
}
