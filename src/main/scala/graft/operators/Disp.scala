package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Zero-sign-safe display rounding, used in matched pairs across both
  * engines (Spark column + DuckDB oracle SQL text).
  *
  * Why it exists: Spark's `round` routes through `BigDecimal`, which has
  * no negative zero, so a tiny negative operand (cosine, covariance,
  * delta, growth rate) rounds to `+0.0`. DuckDB's `round` keeps the IEEE
  * sign and yields `-0.0` for the same operand. The driver's correctness
  * gate hash-compares parquet bytes, where `-0.0 != +0.0` — round 10
  * shipped `embedding_covariance` red on exactly this (rows whose `cov`
  * was DuckDB `-0.0` vs Spark `+0.0`).
  *
  * The normalization is IEEE addition of positive zero: `(-0.0) + 0.0 ==
  * +0.0` under round-to-nearest, and `x + 0.0 == x` for every other
  * double. Applied on BOTH sides it is a no-op for nonzero values and
  * pins zero's sign to `+0.0` everywhere.
  *
  * Discipline (pinned by `DeclarationLintSpec`): every display-rounded
  * DOUBLE column whose operand can cross zero uses [[roundz]] on the
  * Spark side and [[roundzSql]] (or a literal `+ 0.0`) in the oracle SQL.
  * Do NOT use on DECIMAL operands — `+ lit(0.0)` would widen the type to
  * DOUBLE and break the schema gate; decimals have no signed zero anyway.
  */
object Disp {

  /** `round(c, scale) + 0.0` — double-typed display rounding that can
    * never emit `-0.0`, mirroring [[roundzSql]] on the oracle side.
    */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** DuckDB-side twin of [[roundz]]: splice into oracle SQL text. */
  def roundzSql(e: String, scale: Int): String = s"(round($e, $scale) + 0.0)"
}
