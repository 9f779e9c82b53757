package graft

import org.apache.spark.sql.functions._

/** The positional gram expression and the span-island semantics behind
  * `repeated_spans` (the oracle gate proves corpus-level equality; this
  * pins the local invariants a refactor could silently break).
  */
class RepeatedSpansSpec extends SparkSpec {

  import spark.implicits._

  test("positional gram hashes are the un-deduped form of the set expression") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq(
      "a b c d a b c",
      "a b c",
      "x y",
      "one two three four five",
    ).toDF("text")
    val both = docs
      .select(
        expr("graft_gram_hashes_pos(split(text, ' '))").as("pos"),
        expr("graft_gram_hashes(split(text, ' '))").as("set"),
        size(split(col("text"), " ")).as("n"),
      )
      .collect()
    for (r <- both) {
      val pos = r.getSeq[Long](0)
      val set = r.getSeq[Long](1)
      val n = r.getInt(2)
      assert(pos.length == math.max(n - 2, 0), "one hash per starting word")
      assert(pos.distinct == set, "dedup of the positional form is the set form, order kept")
    }
    // the repeated trigram "a b c" hashes identically at both positions
    val first = both.head.getSeq[Long](0)
    assert(first(0) == first(4), "same shingle text must hash equal at any position")
  }

  test("islands coalesce consecutive duplicated positions into maximal spans") {
    graft.functions.GraftFunctions.register(spark)
    // doc 1 and doc 2 share the 4-word run "p q r s" (grams at positions
    // 1,2 of doc 1); doc 1 additionally repeats "z z z" internally at
    // positions 6 and 9 — two separate islands expected for doc 1
    val docs = Seq(
      (1L, "w p q r s t z z z u z z z"),
      (2L, "p q r s k m n"),
    ).toDF("doc_id", "text")
    val e = docs
      .withColumn("ghs", expr("graft_gram_hashes_pos(split(text, ' '))"))
      .select(col("doc_id"), posexplode(col("ghs")).as(Seq("pos", "gh")))
    val dup = e.groupBy("gh").agg(count(lit(1)).as("c")).filter(col("c") >= 2).select("gh")
    import org.apache.spark.sql.expressions.Window
    val spans = e
      .join(dup, Seq("gh"))
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy(col("doc_id"), (col("pos") - col("rn")).as("grp"))
      .agg(
        min("pos").cast("long").as("span_start"),
        (max("pos") - min("pos") + lit(3)).cast("long").as("span_words"),
      )
      .select("doc_id", "span_start", "span_words")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // doc 1: "p q r s" grams start at 1,2 → island [1,2] → 4 words;
    // "z z z" occurs at 6 and 10 → gram positions 6 and 10 (plus any
    // overlap grams that only occur once stay out) → two 3-word islands.
    // doc 2: grams 0,1 → island [0,1] → 4 words.
    assert(spans.contains((1L, 1L, 4L)), s"cross-doc span missing: $spans")
    assert(spans.contains((2L, 0L, 4L)), s"cross-doc span missing in doc 2: $spans")
    assert(spans.contains((1L, 6L, 3L)) && spans.contains((1L, 10L, 3L)),
      s"within-doc repeats must form their own islands: $spans")
  }

  test("the production min-span knob drops short islands and is a pure filter of the substrate") {
    import graft.operators.DedupOps
    val all = DedupOps.repeatedSpans(spark, sfDir) // declared floor: 3 words
    val thr = 6L // fixture-scaled stand-in for the ~50-token production cut
    val cut = DedupOps.repeatedSpans(spark, sfDir, minSpanWords = thr)
    val nAll = all.count()
    val nCut = cut.count()
    // the threshold actually separates on this corpus: some islands are
    // short boilerplate, some are long runs
    assert(nCut > 0 && nCut < nAll, s"min-span $thr does not separate: $nCut of $nAll")
    assert(cut.filter(col("span_words") < thr).isEmpty, "an island under the floor survived")
    // pure refinement: the knob is a filter, never a re-derivation —
    // island boundaries must be identical between the two reads
    assert(cut.exceptAll(all.filter(col("span_words") >= thr)).isEmpty &&
      all.filter(col("span_words") >= thr).exceptAll(cut).isEmpty,
      "knobbed output diverges from filtering the declared output")
  }
}
