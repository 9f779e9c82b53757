package graft

import graft.operators.ApiBodyClassifier
import org.apache.spark.sql.functions.col

/** The reference's 10-case malformed-error-body corpus
  * (tests/conftest.py:465-533) — plus present-but-null-key shapes the
  * corpus misses — against the expression-based classifier:
  * decodable+valid → ok, decodable+invalid → malformed, otherwise
  * undecodable.
  */
class ApiBodySpec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[(String, String)] = Seq(
    ("""{"errors": [{"message": "Try again."}]}""", "ok"), // valid, in the wild
    ("""{"errors": [{}]}""", "malformed"), // element missing message (KeyError)
    ("""{"errors": [[]]}""", "malformed"), // element not an object (TypeError)
    ("""{"errors": []}""", "ok"), // empty list is fine
    ("""{"errors": null}""", "malformed"), // not iterable
    ("""{}""", "malformed"), // missing key (bug 248011 shape)
    ("""[]""", "malformed"), // decodable, wrong shape
    ("""not JSON""", "undecodable"), // Apache errored before PAPI
    (null, "undecodable"), // no body
    ("""{"errors": [{"message": "a"}, {"message": "b"}]}""", "ok"),
    // present-but-null key: error["message"] succeeds in the reference (no
    // KeyError), so this is VALID — key membership, not value nullness
    ("""{"errors": [{"message": null}]}""", "ok"),
    ("""{"errors": [{"message": null}, {"note": "x"}]}""", "malformed"), // 2nd lacks the key
  )

  test("the body corpus classifies exactly as the reference") {
    val df = corpus.zipWithIndex
      .map { case ((body, exp), i) => (i, body, exp) }
      .toDF("i", "body", "expected")
    val got = ApiBodyClassifier.classify(df, col("body")).collect()
    got.foreach { r =>
      assert(
        r.getAs[String]("kind") == r.getAs[String]("expected"),
        s"body=${r.getAs[String]("body")}",
      )
    }
    // messages extracted only for ok rows
    val okMsgs = got
      .filter(_.getAs[String]("kind") == "ok")
      .map(r => Option(r.getAs[scala.collection.Seq[String]]("messages")).getOrElse(Seq.empty))
    assert(okMsgs.exists(_.contains("Try again.")))
    assert(
      got
        .filter(_.getAs[String]("kind") != "ok")
        .forall(_.getAs[scala.collection.Seq[String]]("messages") == null),
    )
  }
}
