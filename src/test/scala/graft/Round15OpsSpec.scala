package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.operators.Ivf

/** Round-15 hardening: the windowless IVF assignment argmin and the
  * two-sided histogram bin clamp (round-14 verdict item 2 and ADVICE
  * finding 1).
  */
class Round15OpsSpec extends SparkSpec {

  private def embeddingsD = graft.Tables
    .embeddings(spark, sfDir)
    .withColumn("dvec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    .select("vec_id", "dvec")

  test("Ivf.assign: no Window operator — argmin is a partial-aggregable struct-min") {
    val e = embeddingsD
    // materialized (LocalRelation) centroids, so the pinned plan is the
    // assign subtree alone — buildCentroids' k-row seed window is a
    // separate, bounded concern
    val cents = spark.createDataFrame(
      Ivf.buildCentroids(spark, e, k = 8, iters = 1).collect().toSeq.asJava,
      Ivf.buildCentroids(spark, e, k = 8, iters = 1).schema)
    val plan = Ivf.assign(spark, e, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "assign must not sort corpus×K rows through a window argmax:\n" + plan.take(1500))
    assert(plan.contains("partial_min") || plan.contains("partial min") ||
      plan.contains("SortAggregate") || plan.contains("ObjectHashAggregate"),
      "assign must combine map-side before the exchange:\n" + plan.take(1500))
  }

  test("Ivf.assign: struct-min argmax matches an independent window argmax exactly") {
    import org.apache.spark.sql.expressions.Window
    val e = embeddingsD.filter(col("vec_id") < 200)
    val cents = Ivf.buildCentroids(spark, e, k = 8, iters = 1)
    val got = Ivf.assign(spark, e, cents)
      .select("vec_id", "cid", "csim").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    graft.functions.GraftFunctions.register(spark)
    val want = e.join(broadcast(cents))
      .withColumn("csim", expr("cosine_similarity(dvec, cvec)"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))))
      .filter(col("rk") === 1)
      .select("vec_id", "cid", "csim").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (v, (cid, csim)) =>
      assert(want(v)._1 == cid, s"vec $v: cid $cid vs window ${want(v)._1}")
      assert(want(v)._2 == csim, s"vec $v: csim $csim vs window ${want(v)._2}")
    }
  }

  test("Ivf.assign: schema-preserving — extra payload columns ride through untouched") {
    val e = embeddingsD.withColumn("tag", col("vec_id") * 7L)
    val cents = Ivf.buildCentroids(spark, embeddingsD, k = 4, iters = 1)
    val out = Ivf.assign(spark, e, cents)
    assert(out.columns.toSeq == Seq("vec_id", "dvec", "tag", "cid", "csim"))
    val bad = out.filter(col("tag") =!= col("vec_id") * 7L).count()
    assert(bad == 0L, "payload column must survive the argmin struct round-trip")
  }

  test("ExactMoments: multi-slice merge equals independent truth; partials really slice") {
    // force ≥ 2 slices: SliceRows + 1000 rows through one partition so
    // the mono-id buckets are exactly ceil(n / SliceRows)
    val n = (graft.operators.ExactMoments.SliceRows + 1000L).toInt
    val df = spark.range(n.toLong).coalesce(1)
      .select(expr("transform(sequence(0, 63), d -> id % 7 + d)").as("q"))
    val (sm, pr, tot) = graft.operators.ExactMoments.exact(df, "q", 64)
    assert(tot == n.toLong)
    val xs = (0L until n.toLong).map(_ % 7)
    assert(sm(0) == BigInt(xs.sum), "dim-0 first moment must match the closed form")
    assert(pr(0) == xs.map(x => BigInt(x) * BigInt(x)).sum,
      "dim-0 second moment must match the closed form")
    // dim 1 (values id%7 + 1): shifted sums
    assert(sm(1) == BigInt(xs.map(_ + 1L).sum))
    val parts = graft.operators.KMeansOps.momentPartials(df)
    assert(parts.count() == 2L,
      s"${n} rows through one partition must produce exactly ceil(n/SliceRows) = 2 slice buffers")
  }

  test("mergeMomentPartials: BigInt merge is exact past the Long bound") {
    // two partials whose element-wise sum exceeds 2⁶³ — the old
    // Math.addExact merge THREW here; the BigInt merge must be exact
    val big = Long.MaxValue / 2 + 10L
    val dim = 64
    val nProds = dim * (dim + 1) / 2
    val part = (Seq.fill(dim)(big), Seq.fill(nProds)(big), 100L)
    val (s, p, n2) = graft.operators.KMeansOps.mergeMomentPartials(Seq(part, part))
    assert(n2 == 200L)
    assert(s(0) == BigInt(big) * 2, "first-moment merge must not wrap")
    assert(p(nProds - 1) == BigInt(big) * 2, "second-moment merge must not wrap")
    assert(s(0) > BigInt(Long.MaxValue), "the merged total is genuinely past the Long bound")
  }

  test("histogramParts: out-of-extent values clamp to the edge bins (both sides)") {
    import spark.implicits._
    // extent pinned to [10, 26) over 16 bins of width 1; arrivals at 3
    // (below lo) and 99 (above hi) must land in bins 0 and 15 — the
    // streaming twin pins its extent up front, so out-of-range arrivals
    // are plausible there (ADVICE r14 finding 1: a below-lo value used
    // to produce a NEGATIVE bin that silently skewed the quantile walk).
    val o = Seq(("a", 3.0), ("a", 99.0), ("a", 10.0), ("a", 25.9))
      .toDF("pri", "x")
    val ext = Seq((10.0, 26.0)).toDF("lo", "hi")
    val parts = graft.operators.RelationalOps.histogramParts(o, ext).collect()
    val bins = parts.map(_.getAs[Int]("bin"))
    assert(bins.forall(b => b >= 0 && b <= 15), s"bins out of range: ${bins.toSeq}")
    val byBin = parts.map(r => r.getAs[Int]("bin") -> r.getAs[Long]("cnt")).toMap
    assert(byBin(0) == 2L, s"lo-edge bin must hold the clamped 3.0 and the in-range 10.0: $byBin")
    assert(byBin(15) == 2L, s"hi-edge bin must hold the clamped 99.0 and the in-range 25.9: $byBin")
  }
}
