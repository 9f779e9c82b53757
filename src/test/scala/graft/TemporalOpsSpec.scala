package graft

import org.apache.spark.sql.functions._

/** Semantics of the temporal operators: the union+window as-of join must
  * agree with a direct per-row scan, and sessionization must partition
  * the event stream with gaps only at session boundaries.
  */
class TemporalOpsSpec extends SparkSpec {

  test("asof_join matches a per-row most-recent-prior scan") {
    val ev = Tables
      .events(spark, sfDir)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_type"),
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicks = ev.filter(_._4 == "click")
    val expected = ev
      .filter(_._4 == "purchase")
      .map { case (eid, uid, t, _) =>
        val prior = clicks.filter(c => c._2 == uid && c._3 <= t)
        // most recent; ties broken by max event_id (the deduped keeper)
        val best =
          if (prior.isEmpty) None
          else Some(prior.maxBy(c => (c._3, c._1))._1)
        eid -> best
      }
      .toMap
    val got = SparkEntry
      .queries("asof_join")(spark, sfDir)
      .collect()
      .map { r =>
        r.getAs[Long]("purchase_id") ->
          (if (r.isNullAt(r.fieldIndex("click_id"))) None
           else Some(r.getAs[Long]("click_id")))
      }
      .toMap
    assert(got == expected)
  }

  test("sessionize agrees with Spark's built-in session_window") {
    // Same gap, two formulations: lag→flag→running-sum (ours, also the
    // DuckDB oracle) vs the built-in merging session_window. Boundary
    // semantics match because a gap of EXACTLY 4h merges in neither
    // (session_window closes at last.ts + gap exclusive; we break on
    // gap > 4h — equality is measure-zero at µs resolution and absent
    // from this deterministic dataset).
    val built = Tables
      .events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("w"))
      .agg(count(lit(1)).as("n_events"), min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select("user_id", "n_events", "start_us", "end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ours = SparkEntry
      .queries("sessionize")(spark, sfDir)
      .select("user_id", "n_events", "start_us", "end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(built == ours, s"built-in session_window diverged: ${(built -- ours).take(3)} vs ${(ours -- built).take(3)}")
  }

  test("sessionize partitions all events; gaps only at session boundaries") {
    val sessions = SparkEntry.queries("sessionize")(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == nEvents, "sessions partition the stream")
    // within a user, consecutive sessions are separated by > gap
    val gapUs = 14400000000L
    sessions
      .groupBy(_.getAs[Long]("user_id"))
      .foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("sess"))
        assert(sorted.map(_.getAs[Long]("sess")).toSeq == (1L to sorted.length).toSeq)
        sorted.zip(sorted.tail).foreach { case (a, b) =>
          assert(
            b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > gapUs,
            "adjacent sessions must be separated by more than the gap",
          )
        }
        sorted.foreach(r =>
          assert(r.getAs[Long]("duration_us") ==
            r.getAs[Long]("end_us") - r.getAs[Long]("start_us")),
        )
      }
  }

  test("bin-join identity: binned interval join equals the naive range join on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // the production invariant behind interval_join_binned: with bin
    // width = window length, [floor(s/W), floor((s+W-1)/W)] covers every
    // bin a probe t ∈ [s, s+W) can land in, so bin-equi-join + exact
    // residual ≡ the naive range predicate — for ARBITRARY windows and
    // probes, not just the date-aligned fixture
    val W = 100L
    val gen = for {
      starts <- Gen.listOfN(25, Gen.choose(0L, 1000L))
      probes <- Gen.listOfN(60, Gen.choose(0L, 1100L))
    } yield (starts, probes)
    val p = Prop.forAll(gen) { case (starts, probes) =>
      val win = starts.zipWithIndex
        .toDF("s", "wid")
        .withColumn("e", col("s") + W)
        .withColumn("bin", explode(expr(s"sequence(s div $W, (e - 1) div $W)")))
      val pr = probes.toDF("t").withColumn("bin", expr(s"t div $W"))
      val binned = win
        .join(pr, Seq("bin"))
        .filter(col("t") >= col("s") && col("t") < col("e"))
        .select("wid", "t")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .sorted
        .toSeq
      val naive = (for {
        (s, wid) <- starts.zipWithIndex
        t <- probes if t >= s && t < s + W
      } yield (wid, t)).sorted
      binned == naive
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(r.passed, r.status.toString)
  }
}
