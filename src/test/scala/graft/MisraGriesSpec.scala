package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.MisraGries

/** The Misra–Gries mergeable heavy-hitters contract: any key with true
  * count > n/(k+1) survives the summary, every estimate lies in
  * [true − n/(k+1), true], and both properties hold under ARBITRARY
  * chunking + merge order (the mergeable-summaries theorem that makes
  * the sketch safe for Spark's partial-agg merge trees) and under real
  * distributed execution at several partitionings.
  */
class MisraGriesSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  private def bounds(summary: Map[String, Long], stream: Seq[String], k: Int): Unit = {
    val n = stream.size.toLong
    val err = n / (k + 1)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (key, t) =>
      if (t > err)
        assert(summary.contains(key), s"heavy key '$key' (count $t > $err) must survive")
    }
    summary.foreach { case (key, est) =>
      val t = truth.getOrElse(key, 0L)
      assert(est <= t && est >= t - err, s"estimate $est for '$key' outside [${t - err}, $t]")
    }
  }

  test("summary bounds hold under arbitrary chunking and merge order") {
    // skewed alphabet: a few hot keys over a long tail
    val token = Gen.frequency(
      5 -> Gen.const("hot1"),
      3 -> Gen.const("hot2"),
      2 -> Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8"),
    )
    val gen = for {
      stream <- Gen.listOfN(300, token)
      k <- Gen.choose(2, 6)
      cuts <- Gen.listOfN(4, Gen.choose(0, stream.size))
    } yield (stream, k, cuts.sorted)
    check(Prop.forAll(gen) { case (stream, k, cuts) =>
      val mg = new MisraGries(k)
      val chunks = (0 +: cuts :+ stream.size)
        .sliding(2)
        .map { case Seq(a, b) => stream.slice(a, b) }
        .toSeq
      val partials = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
      // merge left-to-right AND right-to-left — order must not break bounds
      val l2r = partials.foldLeft(mg.zero)(mg.merge)
      val r2l = partials.foldRight(mg.zero)((a, b) => mg.merge(b, a))
      bounds(l2r, stream, k)
      bounds(r2l, stream, k)
      true
    })
  }

  test("distributed summary keeps the bounds at any partitioning") {
    import spark.implicits._
    val stream = (1 to 400).map(i => s"hot${i % 3}") ++ (1 to 200).map(i => s"tail$i")
    val k = 8
    for (parts <- Seq(1, 4, 13)) {
      val summary = stream.toDS().repartition(parts).select(new MisraGries(k).toColumn).head()
      bounds(summary, stream, k)
    }
  }

  /** `mg_heavy_hitters` is oracle-deterministic ONLY because every
    * per-hour group's distinct key count stays ≤ MgK (the sketch is then
    * exact and merge-order-free). If a fixture refresh ever adds event
    * types past that, the declared result would go merge-order-dependent
    * and the gate would flake with no pointer to the cause — so the
    * exactness precondition is pinned here against BOTH the gate's SF
    * (0.01) and the bench's (0.1).
    */
  test("fixture invariant: per-hour distinct event types stay within the MG capacity") {
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val maxDistinct = Tables
        .events(spark, d)
        .groupBy(date_trunc("hour", col("ts")))
        .agg(countDistinct(col("event_type")).as("n"))
        .agg(max("n"))
        .head()
        .getLong(0)
      assert(
        maxDistinct <= graft.operators.AggregatorOps.MgK,
        s"$d: $maxDistinct distinct event types in one hour exceeds MgK=" +
          s"${graft.operators.AggregatorOps.MgK} — mg_heavy_hitters' exactness " +
          "precondition no longer holds; raise MgK or fix the fixture",
      )
    }
  }
}
