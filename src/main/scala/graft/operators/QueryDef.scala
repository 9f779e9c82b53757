package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2.12: a Spark realization plus (when
  * SQL-expressible) the DuckDB oracle the driver hash-compares against.
  *
  * Determinism contract (SURVEY.md §2.12): every query has a full-key
  * ORDER BY; double aggregation goes through DECIMAL(18,2) so both engines
  * compute the exact same value; timestamps are rendered as strings.
  */
final case class DeclaredQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

trait QueryModule {
  def queries: Seq[DeclaredQuery]
}
