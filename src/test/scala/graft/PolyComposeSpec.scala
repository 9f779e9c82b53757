package graft

import org.apache.spark.sql.functions._

/** The algebraic shingle-hash composition must equal hashing the
  * concatenated gram string: H(a||b) = H(a)·31^len(b) + H(b) (mod M),
  * separator = ·31 + 32. Covers empty words (double spaces) and
  * non-ASCII.
  */
class PolyComposeSpec extends SparkSpec {

  private val M = 1000000007L

  private def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % M
      i += Character.charCount(cp)
    }
    h
  }

  test("graft_pow31 equals 31^codepoints mod M") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val words = Seq("", "a", "spark", "héllo", "g𝄞clef")
    val got = words.toDF("w").select(expr("graft_pow31(w)")).as[Long].collect()
    val exp = words.map { w =>
      val n = w.codePointCount(0, w.length)
      (1 to n).foldLeft(1L)((p, _) => (p * 31L) % M)
    }
    assert(got.toSeq == exp)
  }

  test("composed trigram hashes equal char-fold hashes of the gram strings") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps",
      "a b c",
      "double  space words here", // empty word from the double space
      "héllo wörld €uro test",
      "two words", // < 3 words → no grams
      "x",
    )
    val got = texts
      .toDF("text")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("hws", expr("transform(ws, w -> graft_poly_hash(w))"))
      .withColumn("pws", expr("transform(ws, w -> graft_pow31(w))"))
      .withColumn(
        "ghs",
        expr(
          s"""IF(size(ws) >= 3,
             |   transform(sequence(1, size(ws) - 2), i ->
             |     ((((((element_at(hws, i)) * 31 + 32) % $M * element_at(pws, i + 1) + element_at(hws, i + 1)) % $M) * 31 + 32) % $M * element_at(pws, i + 2) + element_at(hws, i + 2)) % $M),
             |   array())""".stripMargin,
        ),
      )
      .select("text", "ghs")
      .as[(String, Seq[Long])]
      .collect()
      .toMap
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      val expected =
        if (ws.length < 3) Seq.empty
        else ws.sliding(3).map(g => polyHash(g.mkString(" "))).toSeq
      assert(got(t) == expected, s"composition mismatch for '$t'")
    }
  }

  test("graft_gram_hashes equals distinct char-fold hashes of the gram strings") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps",
      "a b a b a b a b", // repeated grams → distinct matters
      "double  space words here",
      "héllo wörld €uro test 𝄞 note",
      "one two",
      "",
    )
    val got = texts
      .toDF("text")
      .select(col("text"), expr("graft_gram_hashes(split(text, ' '))").as("ghs"))
      .as[(String, Seq[Long])]
      .collect()
      .toMap
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      val expected =
        if (ws.length < 3) Seq.empty
        else ws.sliding(3).map(g => polyHash(g.mkString(" "))).toSeq.distinct
      assert(got(t) == expected, s"gram-hash mismatch for '$t'")
    }
  }
}
