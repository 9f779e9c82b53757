package graft

import org.apache.spark.sql.functions._
import graft.plans.BinRangeJoin

/** The range-join binning rule: a naive `t >= s AND t < s + W` inner join
  * must re-plan as a bin equi-join (no nested loop), return exactly the
  * rows the un-rewritten join returns (negative values included — the
  * pmod floor-division), and leave joins that already have an equi key
  * untouched.
  */
class BinRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(BinRangeJoin)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  // negative and positive bounds: floor-division sign behavior is on trial
  private lazy val wins = Seq(-250L, -100L, -1L, 0L, 99L, 400L, 777L).toDF("s")
  private lazy val probes = (-300L to 900L by 7L).toDF("t")
  private val W = 100L

  private def naiveJoin = wins.join(probes, col("t") >= col("s") && col("t") < col("s") + W)

  test("naive range join re-plans as a bin equi-join, results unchanged") {
    val expected = naiveJoin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)
    withRule {
      val j = naiveJoin
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_bin"), s"rule must fire:\n${opt.take(800)}")
      val phys = j.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
        s"binned join must be an equi join:\n${phys.take(800)}")
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expected.toSeq)
    }
  }

  test("closed-interval (BETWEEN) form re-plans too; the boundary row is kept") {
    // t = s + W is IN the closed range — the upper exploded bin must
    // extend to floor((s+W)/W) or the boundary match silently drops
    val cw = Seq(0L, 100L, 350L).toDF("s")
    val cp = Seq(0L, 99L, 100L, 101L, 200L, 449L, 450L, 451L).toDF("t")
    def closedJoin = cw.join(cp, col("t") >= col("s") && col("t") <= col("s") + W)
    val expected = closedJoin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.contains((0L, 100L)) && expected.contains((350L, 450L)),
      "fixture must exercise the t = s + W boundary")
    withRule {
      val j = closedJoin
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("graft_bin"), s"rule must fire on BETWEEN:\n${opt.take(800)}")
      val phys = j.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
        s"binned join must be an equi join:\n${phys.take(800)}")
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expected.toSeq)
    }
  }

  test("joins that already have an equi key are left alone") {
    val l = Seq((1L, 10L), (2L, 50L)).toDF("k", "s")
    val r = Seq((1L, 15L), (2L, 500L)).toDF("k2", "t")
    withRule {
      val j = l.join(r, col("k") === col("k2") && col("t") >= col("s") && col("t") < col("s") + W)
      assert(!j.queryExecution.optimizedPlan.toString.contains("graft_bin"),
        "equi-keyed joins hash-partition fine without binning")
      assert(j.count() == 1) // only (1, 15) falls in [10, 110)
    }
  }

  test("the declared interval join's manual plan equals the rule's automatic plan") {
    // same fixture as interval_join_binned, written naively — the rule
    // must reproduce the declared query's result through its own rewrite
    val win = Tables
      .orders(spark, sfDir)
      .filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("s"))
    val probe = Tables
      .lineitem(spark, sfDir)
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("t"), col("l_quantity"))
    val binUs = 604800000000L
    def q = win
      .join(probe, col("t") >= col("s") && col("t") < col("s") + binUs)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy("o_orderkey")
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val declared = SparkEntry
      .queries("interval_join_binned")(spark, sfDir)
      .select("o_orderkey", "n_shipped")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(expected == declared)
    withRule {
      val j = q
      assert(j.queryExecution.optimizedPlan.toString.contains("graft_bin"))
      assert(j.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == expected)
    }
  }
}
