package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeOps

/** The distributed BPE trainer against a sequential reference: same
  * greedy left-to-right merge semantics, same lexicographic tie-break,
  * merge-for-merge equal output and identical final symbol sequences.
  * (The pair-statistics round itself is oracle-gated as
  * `bpe_pair_counts`.)
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE on a (word -> count) map: pair counts weighted by word
    * frequency, argmax with (count desc, pair asc) tie-break, greedy
    * left-to-right non-overlapping application.
    */
  private def referenceTrain(
      words: Map[String, Long],
      rounds: Int,
  ): (Seq[(String, String)], Map[String, Seq[String]]) = {
    var syms: Map[String, Seq[String]] =
      words.map { case (w, _) => w -> w.toSeq.map(_.toString) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, ss) <- syms; i <- 0 until ss.length - 1)
        counts((ss(i), ss(i + 1))) = counts.getOrElse((ss(i), ss(i + 1)), 0L) + words(w)
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        syms = syms.map { case (w, ss) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- ss)
            if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
            else out += x
          w -> out.toSeq
        }
      }
    }
    (merges.toSeq, syms)
  }

  test("5 distributed merge rounds equal the sequential reference merge-for-merge") {
    val words = Map(
      "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L, "newer" -> 4L,
    )
    val vocabDf = words.toSeq.toDF("w", "wc")
    val (refMerges, refSyms) = referenceTrain(words, 5)
    val gotMerges = BpeOps.bpeTrain(vocabDf, 5)
    assert(gotMerges == refMerges, s"got $gotMerges, reference $refMerges")

    // applying the learned merges distributed reproduces the reference's
    // final symbol sequences exactly
    var df = vocabDf.select(
      col("w"),
      expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))").as("syms"),
    )
    for ((a, b) <- gotMerges) df = df.withColumn("syms", BpeOps.applyMerge(col("syms"), a, b))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got == refSyms, s"symbol sequences diverge:\n got=$got\n ref=$refSyms")
  }

  test("random vocabularies: trainer equals reference across tie-breaks and repeats") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 3) {
      // tiny alphabet forces heavy pair collisions, ties, and
      // within-word repeats (the fold's edge cases)
      val words = (1 to 12)
        .map(_ => (1 to (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toLong }
      val vocabDf = words.toSeq.toDF("w", "wc")
      val (refMerges, refSyms) = referenceTrain(words, 4)
      val gotMerges = BpeOps.bpeTrain(vocabDf, 4)
      assert(gotMerges == refMerges, s"trial $trial: got $gotMerges, reference $refMerges")
      var df = vocabDf.select(
        col("w"),
        expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))").as("syms"),
      )
      for ((a, b) <- gotMerges) df = df.withColumn("syms", BpeOps.applyMerge(col("syms"), a, b))
      val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      assert(got == refSyms, s"trial $trial: symbol sequences diverge")
    }
  }

  /** Sequential reference encoder: greedy left-to-right application of a
    * FIXED merge list, in order (what a shipped tokenizer does).
    */
  private def referenceEncode(w: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(w.toSeq.map(_.toString): Seq[String]) { case (ss, (a, b)) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (x <- ss)
        if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
        else out += x
      out.toSeq
    }

  test("the shipped EncodeMerges tokenizer round-trips the sequential encoder on the corpus vocab") {
    // the declared bpe_encode artifact (trained offline via bpeTrain),
    // applied distributed, must equal the sequential reference encoder
    // word-for-word on real corpus vocabulary — multi-char merges
    // ("m"+"er", "p"+"ar") included
    val vocabDf = BpeOps
      .vocab(spark, "/root/testdata/sf0.001")
      .filter(col("w") =!= "")
      .localCheckpoint()
    var df = vocabDf.select(
      col("w"),
      expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))").as("syms"),
    )
    df = df.withColumn("syms", BpeOps.applyMerges(col("syms"), BpeOps.EncodeMerges))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val ref = got.keys.map(w => w -> referenceEncode(w, BpeOps.EncodeMerges)).toMap
    assert(got == ref, s"encoder diverges from sequential reference")
    // tokens must concatenate back to the word (BPE is a segmentation)
    got.foreach { case (w, ts) => assert(ts.mkString == w, s"$w re-concatenation failed: $ts") }
    // and the multi-char merges actually fire on this corpus
    val allToks = got.values.flatten.toSet
    assert(allToks.exists(_.length > 2), s"no multi-char merged token fired: $allToks")
  }

  test("EncodeMerges provenance: bpeTrain at the stated fixture (sf0.01, 10 rounds) yields it") {
    // the shipped artifact's doc claims it IS what bpeTrain produces on
    // the documents corpus at 10 rounds, sf0.01 — pin that, so the
    // literal cannot silently drift from the trainer
    val vocabDf = BpeOps
      .vocab(spark, "/root/testdata/sf0.01")
      .filter(col("w") =!= "")
    val merges = BpeOps.bpeTrain(vocabDf.select(col("w"), col("wc")), 10)
    assert(merges == BpeOps.EncodeMerges,
      s"trained=$merges differs from shipped EncodeMerges=${BpeOps.EncodeMerges}")
  }

  test("data-driven merge fold equals the chained-expression fold on the corpus vocab") {
    // applyMerges ships the merge list as a literal array folded in one
    // constant-size expression; applyMergesChained builds one nested
    // fold per merge. Same greedy semantics, pinned equal.
    val vocabDf = BpeOps
      .vocab(spark, "/root/testdata/sf0.001")
      .filter(col("w") =!= "")
      .select(
        col("w"),
        expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))").as("syms"),
      )
      .localCheckpoint()
    val a = vocabDf
      .select(col("w"), BpeOps.applyMerges(col("syms"), BpeOps.EncodeMerges).as("m"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
      .toMap
    val b = vocabDf
      .select(col("w"), BpeOps.applyMergesChained(col("syms"), BpeOps.EncodeMerges).as("m"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
      .toMap
    assert(a == b, "data-driven and chained folds diverge")
  }

  test("token_count's est_bpe heuristic brackets the real BPE token count") {
    // the chars/4 estimate is the planning heuristic; the encoder is the
    // ground truth. With only 10 merges the real count sits between the
    // estimate (a deep-vocab lower bound) and the character count — pin
    // that bracket corpus-wide so the two surfaces stay consistent.
    val est = SparkEntry
      .queries("token_count")(spark, sfDir)
      .agg(sum("est_bpe"))
      .collect()(0)
      .getLong(0)
    val vocabDf = BpeOps.vocab(spark, sfDir).filter(col("w") =!= "")
    val real = vocabDf
      .select(
        col("wc"),
        expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))").as("syms"),
      )
      .withColumn("syms", BpeOps.applyMerges(col("syms"), BpeOps.EncodeMerges))
      .agg(sum(expr("wc * size(syms)")))
      .collect()(0)
      .getLong(0)
    val chars = vocabDf.agg(sum(expr("wc * char_length(w)"))).collect()(0).getLong(0)
    assert(est <= real && real <= chars,
      s"est_bpe=$est should lower-bound real BPE=$real which is under chars=$chars")
  }

  test("encode(train(corpus)) round-trips: freshly trained merges applied = reference encode") {
    val vocabDf = BpeOps
      .vocab(spark, "/root/testdata/sf0.001")
      .filter(col("w") =!= "")
      .localCheckpoint()
    val merges = BpeOps.bpeTrain(vocabDf.select(col("w"), col("wc")), 6)
    var df = vocabDf.select(
      col("w"),
      expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))").as("syms"),
    )
    df = df.withColumn("syms", BpeOps.applyMerges(col("syms"), merges))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val ref = got.keys.map(w => w -> referenceEncode(w, merges)).toMap
    assert(got == ref, "train-then-encode diverges from the sequential reference")
  }

  test("greedy fold handles overlapping occurrences like the reference (aaa under (a,a))") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a")).toDF("syms")
    val out = df
      .select(BpeOps.applyMerge(col("syms"), "a", "a").as("m"))
      .collect()
      .map(_.getSeq[String](0).toSeq)
    assert(out(0) == Seq("aa", "a"), s"non-overlapping left-to-right: ${out(0)}")
    assert(out(1) == Seq("aa", "aa"), s"non-overlapping left-to-right: ${out(1)}")
  }
}
