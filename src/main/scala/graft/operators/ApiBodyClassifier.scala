package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** API error-body decode/validation (onefs.py:297-315 `APIError.errors`):
  * a body is UNDECODABLE if it isn't JSON at all (or is absent),
  * MALFORMED if it decodes but doesn't carry `{"errors": [{"message":
  * ...}, ...]}`, and OK otherwise (empty error lists included). The
  * reference drives this with a 10-case pytest corpus
  * (tests/conftest.py:465-533); ApiBodySpec mirrors those shapes plus the
  * present-but-null `{"message": null}` key, which the reference's
  * `error["message"]` lookup accepts (no KeyError) — so elements are
  * parsed as maps and validated by KEY MEMBERSHIP, not value nullness
  * (a struct parse can't tell key-absent from key-null).
  *
  * Pure expressions: `try_parse_json` (variant) probes decodability,
  * `from_json` extracts the expected shape, `forall` + `map_contains_key`
  * validate every element — all codegen-friendly, no UDF.
  */
object ApiBodyClassifier {

  private val shape = "errors array<map<string,string>>"

  /** Adds `kind` ('ok | 'malformed | 'undecodable) and `messages`. */
  def classify(df: DataFrame, body: Column): DataFrame = {
    val parsed =
      from_json(body, org.apache.spark.sql.types.StructType.fromDDL(shape))
    val errorsCol = parsed.getField("errors")
    df.withColumn(
      "kind",
      when(body.isNull || try_parse_json(body).isNull, "undecodable")
        .when(
          errorsCol.isNotNull && forall(
            errorsCol,
            e => e.isNotNull && map_contains_key(e, "message"),
          ),
          "ok",
        )
        .otherwise("malformed"),
    ).withColumn(
      "messages",
      when(col("kind") === "ok", transform(errorsCol, e => element_at(e, "message")))
        .otherwise(lit(null).cast("array<string>")),
    )
  }
}
