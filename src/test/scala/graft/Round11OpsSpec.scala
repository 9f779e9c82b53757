package graft

import org.apache.spark.sql.functions._

/** Round-11 invariants: the DECIMAL(38) moment-accumulation knob
  * (value parity + the Long-wrap hazard it exists to remove) and the
  * `record_linkage` × `salted_join` skew composition (identical links,
  * salt really in the exchange).
  */
class Round11OpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("wide (DECIMAL 38) covariance moments equal the BIGINT path exactly") {
    val narrow = operators.SimilarityOps
      .covarianceMoments(spark, sfDir, wide = false)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))
      .toSeq
    val wide = operators.SimilarityOps
      .covarianceMoments(spark, sfDir, wide = true)
      .select(
        col("i"), col("j"), col("n"),
        col("si").cast("long"), col("sj").cast("long"), col("sij").cast("long"),
        col("cov"),
      )
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))
      .toSeq
    assert(narrow.nonEmpty && wide == narrow,
      "DECIMAL(38) accumulators must reproduce the BIGINT moments bit-for-bit in range")
  }

  test("BIGINT sum fails at Long scale where DECIMAL(38) stays exact — the knob's reason") {
    import spark.implicits._
    // 4 addends of ~0.9 * Long.MaxValue: the true sum (~3.3e19) exceeds
    // Long range. Under Spark 4's ANSI default the BIGINT accumulator
    // THROWS mid-job — a 100 TB moment aggregation that dies hours in —
    // while DECIMAL(38) holds ~1e38 of headroom and returns the true
    // value. (Pre-ANSI Spark wrapped silently — worse: corrupt moments,
    // no error. Either way the knob is the fix.)
    val v = (Long.MaxValue / 10L) * 9L
    val df = Seq(v, v, v, v).toDF("x")
    val truth = java.math.BigInteger.valueOf(v).multiply(java.math.BigInteger.valueOf(4L))
    val wideSum = df.agg(sum($"x".cast("decimal(38,0)"))).collect()(0).getDecimal(0)
    assert(wideSum.toBigInteger == truth, "DECIMAL(38) must carry the true sum")
    val longOutcome =
      try Left(df.agg(sum($"x")).collect()(0).getLong(0))
      catch { case e: Throwable => Right(e) }
    longOutcome match {
      case Right(e) =>
        assert(e.toString.toLowerCase.contains("overflow"),
          s"BIGINT path failed for an unexpected reason: $e")
      case Left(got) =>
        assert(java.math.BigInteger.valueOf(got) != truth,
          "BIGINT must overflow (throw or wrap) — if this holds, the knob's premise changed")
    }
  }

  test("salted record linkage links exactly the plain blocking join's pairs") {
    val (c, p) = operators.DedupOps.linkageSides(spark, sfDir)
    val plain = q("record_linkage")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
      .toSet
    val salted = operators.DedupOps
      .linkedPairsSalted(c, p, buckets = 8L)
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
      .toSet
    assert(plain.nonEmpty && salted == plain,
      "salting the blocking join must not change the linked-pair set")
  }

  test("salted linkage under a pathological block: one nation holds 90% of rows") {
    // Synthetic skew the fixture doesn't have: block 0 carries ~90% of
    // both sides. The composition must still produce exactly the plain
    // join's links — salting redistributes work, never candidates.
    import spark.implicits._
    val c = (0L until 400L)
      .map(i => (i, if (i % 10L < 9L) 0L else i % 10L, i % 7L, i % 100L))
      .toDF("c_custkey", "nationkey", "c_band", "c_num")
    val p = (0L until 80L)
      .map(i => (i, if (i % 10L < 9L) 0L else i % 10L, i % 7L, i % 100L))
      .toDF("s_suppkey", "nationkey", "s_band", "s_num")
    val plain = operators.DedupOps
      .scoreLinks(c.join(p, Seq("nationkey")))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
      .toSet
    val salted = operators.DedupOps
      .linkedPairsSalted(c, p, buckets = 8L)
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
      .toSet
    assert(plain.nonEmpty && salted == plain)
  }

  test("scd2_intervals is a correct point-in-time index of the event stream") {
    // The property the SCD-2 shape exists for: for EVERY event, the
    // interval covering its timestamp carries that event's type; plus
    // the structural invariants (per-user chain contiguity, adjacent
    // types differ, exactly one open row per user). Checked against a
    // driver-side replay — an oracle independent of the window plan.
    val rows = q("scd2_intervals")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      .toSeq
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq((_, t1, _, to1), (_, t2, from2, _)) =>
          assert(to1 == from2, s"user $u: intervals must chain (valid_to == next valid_from)")
          assert(t1 != t2, s"user $u: adjacent interval types must differ")
        case _ => ()
      }
      assert(sorted.count(_._4 == Long.MaxValue) == 1, s"user $u: exactly one open interval")
      assert(sorted.last._4 == Long.MaxValue, s"user $u: the open interval is the latest")
    }
    val events = Tables
      .events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.expr("unix_micros(ts)"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(events.nonEmpty)
    // the point-in-time read is only unambiguous when no user has two
    // events at the same µs (at a tie the query breaks the RUN order by
    // event_id, but "the" type at that instant is not well defined) —
    // so the check covers exactly the tie-free instants, which must be
    // essentially all of them (current testdata has zero ties; a
    // regenerated fixture may grow a few without voiding the property).
    val tieFree = events
      .groupBy(e => (e._1, e._2))
      .collect { case (_, es) if es.size == 1 => es.head }
      .toSeq
    assert(tieFree.size * 10 >= events.length * 9,
      "fixture became tie-dominated — the point-in-time check lost its teeth")
    tieFree.foreach { case (u, t, typ) =>
      val covering = byUser(u).filter(iv => iv._3 <= t && t < iv._4)
      assert(covering.size == 1, s"event at $t (user $u) must fall in exactly one interval")
      assert(covering.head._2 == typ,
        s"user $u at $t: interval type ${covering.head._2} != event type $typ")
    }
  }

  test("the salted linkage exchange is keyed on (nationkey, __salt)") {
    val (c, p) = operators.DedupOps.linkageSides(spark, sfDir)
    val plan = operators.DedupOps
      .linkedPairsSalted(c, p, buckets = 8L)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("__salt"),
      "salt column must survive into the physical plan's exchange keys")
    assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(plan).isDefined,
      s"expected hashpartitioning on __salt in:\n$plan")
  }
}
