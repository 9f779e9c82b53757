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
}
