package graft

import org.apache.spark.sql.functions._

/** The hot-shingle df-cap: on a corpus with a viral boilerplate phrase,
  * capping shingle document frequency must collapse the candidate-pair
  * count while keeping every genuinely-similar pair whose overlap isn't
  * exclusively boilerplate.
  */
class DfCapSpec extends SparkSpec {

  test("df-cap collapses candidate pairs from a viral shingle") {
    import spark.implicits._
    // 200 unrelated docs sharing one viral sentence + 2 planted near-dups
    val viral = "subscribe to our newsletter for more updates today"
    val docs = (0 until 200)
      .map(i => (i.toLong, s"$viral unique$i filler$i content$i body$i text$i end$i"))
      .toSeq ++ Seq(
      (500L, "alpha beta gamma delta epsilon zeta eta theta"),
      (501L, "alpha beta gamma delta epsilon zeta eta iota"),
    )
    val df = docs.toDF("doc_id", "text")
    df.createOrReplaceTempView("dfcap_docs")

    def pairsWith(maxDf: Option[Long]): Set[(Long, Long)] = {
      graft.functions.GraftFunctions.register(spark)
      val e0 = df
        .withColumn("ghs", expr("graft_gram_hashes(split(text, ' '))"))
        .select(col("doc_id"), size(col("ghs")).as("n"), explode(col("ghs")).as("gh"))
      // the PRODUCTION cap, not a reimplementation — a regression in
      // capByDf must fail this spec
      val e = maxDf.fold(e0)(cap => graft.operators.DedupOps.capByDf(e0, cap))
      val x = e.select(col("doc_id").as("da"), col("n").as("na"), col("gh"))
      val y = e.select(col("doc_id").as("db"), col("n").as("nb"), col("gh").as("gh2"))
      x.join(y, x("gh") === y("gh2") && x("da") < y("db"))
        .select("da", "db")
        .distinct()
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
    }

    val uncapped = pairsWith(None)
    val capped = pairsWith(Some(10L))
    // viral shingles pair all 200 docs: ~200·199/2 candidates
    assert(uncapped.size > 19000, s"viral shingle must explode candidates: ${uncapped.size}")
    // cap kills the boilerplate pairs, keeps the planted near-dup
    assert(capped.contains((500L, 501L)), "genuine near-dup must survive the cap")
    assert(capped.size < 100, s"cap must collapse boilerplate candidates: ${capped.size}")
  }
}
