package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the text-analysis surface: the cross-engine
  * polynomial hash matches a direct Scala fold, fingerprints respect
  * (only) the intended invariances, and dedup collapses duplicates.
  */
class TextOpsSpec extends SparkSpec {

  /** Direct Scala mirror of TextOps.wordHashSpark. */
  private def polyHash(w: String): Long =
    w.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  test("Spark polynomial word hash matches the Scala fold") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val words = Seq("spark", "the", "a", "join merge", "x")
    val got = words
      .toDF("w")
      .select(expr(graft.operators.TextOps.wordHashSpark).as("h"))
      .as[Long]
      .collect()
    assert(got.toSeq == words.map(polyHash))
  }

  test("native graft_poly_hash equals the interpreted HOF fold, incl. non-ASCII") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // é (2-byte UTF-8), € (3-byte), 𝄞 (4-byte, surrogate pair in UTF-16):
    // split(w, '') + ascii() folds code points, so the native loop must too
    val words = Seq("spark", "", "a", "héllo", "€uro", "g𝄞clef", "mixed é€𝄞")
    val rows = words
      .toDF("w")
      .select(
        expr(graft.operators.TextOps.wordHashSpark).as("native"),
        expr(graft.operators.TextOps.wordHashSparkHof).as("hof"),
      )
      .collect()
    rows.zip(words).foreach { case (r, w) =>
      assert(r.getLong(0) == r.getLong(1), s"native != HOF for '$w'")
    }
  }

  test("fp_canon is shuffle-invariant, fp_roll is order-sensitive") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"), // same multiset, different order
      (3L, "alpha beta delta"),
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_tmp")
    val fp = df
      .withColumn("ws", split(col("text"), " "))
      .select(
        col("doc_id"),
        md5(array_join(sort_array(col("ws")), " ")).as("fp_canon"),
        expr(
          s"""aggregate(transform(ws, w -> ${graft.operators.TextOps.wordHashSpark}),
             |CAST(0 AS BIGINT), (acc, h) -> (acc * 1000003 + h) % 2147483647)""".stripMargin,
        ).as("fp_roll"),
      )
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(fp(1L)._1 == fp(2L)._1, "canonical fingerprint must ignore word order")
    assert(fp(1L)._2 != fp(2L)._2, "rolling fingerprint must see word order")
    assert(fp(1L)._1 != fp(3L)._1, "different multisets must differ")
  }

  test("exact_dedup_docs keeps exactly one representative per text") {
    val df = SparkEntry.queries("exact_dedup_docs")(spark, sfDir)
    val agg = df
      .groupBy("text_sha")
      .agg(
        sum(when(col("keep_exact"), 1).otherwise(0)).as("kept"),
        min(when(col("keep_exact"), col("doc_id"))).as("keeper"),
        min(col("doc_id")).as("min_id"),
      )
      .collect()
    assert(agg.forall(_.getAs[Long]("kept") == 1L))
    assert(agg.forall(r => r.getAs[Long]("keeper") == r.getAs[Long]("min_id")))
  }

  test("text_stats ratios are in [0,1] and word counts positive") {
    val rows = SparkEntry.queries("text_stats")(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Long]("n_words") > 0))
    assert(rows.forall { r =>
      val u = r.getAs[Double]("uniq_ratio"); u >= 0.0 && u <= 1.0
    })
    assert(rows.forall { r =>
      val s0 = r.getAs[Double]("stopword_ratio"); s0 >= 0.0 && s0 <= 1.0
    })
  }

  test("lang_id predicts a label from the closed set") {
    val preds = SparkEntry
      .queries("lang_id")(spark, sfDir)
      .select("predicted")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    assert(preds.subsetOf(Set("en", "es", "de", "zh", "fr")))
  }

  test("winnowing equals the sequential reference selection on the corpus grams") {
    graft.functions.GraftFunctions.register(spark)
    val W = 4
    def referenceWinnow(gs: Seq[Long]): Seq[Long] =
      if (gs.isEmpty) Seq.empty
      else if (gs.length < W) Seq(gs.min)
      else (0 to gs.length - W).map(i => gs.slice(i, i + W).min).distinct
    val rows = graft.Tables
      .documents(spark, sfDir)
      .withColumn("gs", org.apache.spark.sql.functions.expr("graft_gram_hashes_pos(split(text, ' '))"))
      .select("doc_id", "gs")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    val got = SparkEntry
      .queries("winnow_fingerprint")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    for ((docId, nGrams, nFps, fpXor) <- got) {
      val ref = referenceWinnow(rows(docId))
      assert(nGrams == rows(docId).length, s"doc $docId gram count")
      assert(nFps == ref.length, s"doc $docId fingerprint count: got $nFps, ref ${ref.length}")
      assert(fpXor == ref.foldLeft(0L)(_ ^ _), s"doc $docId xor mismatch")
      // the winnowing guarantee's useful half: selection is a real
      // reduction but never empties a non-trivial document
      if (nGrams >= W) assert(nFps <= nGrams - W + 1 && nFps >= 1)
    }
  }
}
