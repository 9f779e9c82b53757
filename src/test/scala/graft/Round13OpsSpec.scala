package graft

import org.apache.spark.sql.functions._

/** Round-13 hardening: the ADVICE items that survive only as runtime
  * behavior get pinned here (the streaming ones live in StreamingSpec).
  */
class Round13OpsSpec extends SparkSpec {

  test("cumulative_unique_sketch keeps emitting days after register saturation") {
    import spark.implicits._
    // Day 0 occupies registers 0..9; days 1 and 2 bring only RETURNING
    // registers but NEW users — exactly the regime (users ≳ m) the
    // sketch tier exists for. A curve keyed on first-occupancy days
    // would silently stop at day 0; the day axis must instead be the
    // event-day set, with both running sums forward-filled.
    val bkt = Seq.tabulate(10)(b => (0, b)) ++ Seq.tabulate(10)(b => (1, b)) ++ Seq((2, 3))
    val users = Seq.tabulate(10)(u => (0, u.toLong)) ++
      Seq.tabulate(5)(u => (1, (10 + u).toLong)) ++ Seq((2, 15L))
    val out = operators.TemporalOps
      .cumulativeSketchFrom(bkt.toDF("day", "bkt"), users.toDF("day", "user_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSeq
    assert(out.map(_._1) == Seq("1970-01-01", "1970-01-02", "1970-01-03"),
      "every event day must emit a row even when no new register is occupied")
    assert(out.map(_._2) == Seq(10L, 10L, 10L),
      "occupancy must forward-fill across saturated days")
    assert(out.map(_._3) == Seq(10L, 15L, 16L),
      "the exact cumulative curve must keep rising alongside")
  }

  test("sketchEst-backed queries agree between DSL column and any column name") {
    // Regression pin for the Column-argument fix: the estimate column is
    // built FROM the passed Column, so a rename upstream cannot silently
    // rebind it to a stale attribute (the old expr-string hardcoded `v`).
    val r = SparkEntry.queries("rolling_active_sketch")(spark, sfDir)
      .select(col("v"), col("est"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val v = row.getLong(0)
      val want =
        math.floor(-8192.0 * math.log(1.0 - math.min(v, 8191L) / 8192.0) + 0.5).toLong
      assert(row.getLong(1) == want, s"est must be the linear-counting estimate of v=$v")
    }
  }
}
