package graft

import org.apache.spark.sql.functions._

/** The model-based quality filter (`quality_score`): the scan-local HOF
  * score must equal the distributed explode/join/groupBy formulation
  * (partitioning-independence of the integer dot), and threshold
  * filtering must compose with `clean_corpus` as the model-filter stage
  * a CCNet-style pipeline chains after the heuristics.
  */
class QualityScoreSpec extends SparkSpec {

  import spark.implicits._

  private def scores = SparkEntry.queries("quality_score")(spark, sfDir)

  test("scan-local HOF score equals the exploded distributed formulation") {
    graft.functions.GraftFunctions.register(spark)
    val wdf = graft.operators.TextOps.QsWeights.zipWithIndex
      .map { case (w, i) => (i, w) }
      .toDF("idx", "wt")
    val exploded = graft.Tables
      .documents(spark, sfDir)
      .withColumn("toks", expr("filter(split(text, ' '), w -> w <> '')"))
      .withColumn(
        "feats",
        expr("""concat(toks,
               |  IF(size(toks) >= 2,
               |     zip_with(slice(toks, 1, size(toks) - 1),
               |              slice(toks, 2, size(toks) - 1),
               |              (a, b) -> concat(a, ' ', b)),
               |     CAST(array() AS array<string>)))""".stripMargin),
      )
      .select(col("doc_id"), explode(col("feats")).as("f"))
      .withColumn("idx", expr("CAST(graft_poly_hash(f) % 64 AS INT)"))
      .join(wdf, Seq("idx"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("wt").as("score_sum"))
    val hof = scores.select("doc_id", "n_feats", "score_sum")
    assert(hof.exceptAll(exploded).isEmpty && exploded.exceptAll(hof).isEmpty,
      "HOF score diverges from the exploded groupBy formulation")
  }

  test("threshold filtering separates the corpus and composes with clean_corpus") {
    val s = scores.select("doc_id", "quality").collect()
    val qs = s.map(_.getDouble(1)).sorted
    val thr = qs(qs.length / 2) // median: both sides non-empty by construction
    val kept = s.count(_.getDouble(1) >= thr)
    assert(kept > 0 && kept < s.length, s"median threshold $thr does not separate")

    // the composed pipeline: heuristic clean_corpus stage, then the model
    // filter — an inner join on the surviving ids, exactly how the stage
    // chains in production (both sides keyed on doc_id, no re-scoring)
    val clean = SparkEntry.queries("clean_corpus")(spark, sfDir)
    val composed = clean.join(
      scores.filter(col("quality") >= thr).select("doc_id"),
      Seq("doc_id"),
    )
    val nClean = clean.count()
    val nComposed = composed.count()
    assert(nComposed > 0 && nComposed <= nClean,
      s"composed model filter out of range: $nComposed of $nClean")
    // composition is a pure refinement: every composed row is a clean row
    assert(composed.select("doc_id").exceptAll(clean.select("doc_id")).isEmpty)
  }
}
