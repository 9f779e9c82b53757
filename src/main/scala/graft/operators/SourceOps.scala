package graft.operators

import org.apache.spark.sql.functions._

/** Declared query over the [[graft.sources.StateSource]] DataSource V2
  * connector (SURVEY.md §2.1 S3 — the OneFS entity-scan surface as a
  * first-class Spark table). The `id` range predicate is consumed by the
  * source (rows outside it are never generated — the REST-query-filter
  * analog); the `kind` predicate stays a residual post-scan filter; the
  * projection drops `kind` from row materialization. The oracle rebuilds
  * the same deterministic rows from a DuckDB `range()`.
  */
object SourceOps extends QueryModule {

  private val stateScan = DeclaredQuery(
    "state_scan",
    (s, _) =>
      s.read
        .format("graft.sources.StateSource")
        .option("rows", "20000")
        .option("slices", "8")
        .load()
        .filter(col("id") >= 2500 && col("id") < 12500 && col("kind") === "user")
        .select("id", "name", "zone")
        .orderBy("id"),
    Some("""SELECT i AS id, 'u' || i AS name, 'z' || (i % 5) AS zone
            FROM range(2500, 12500) t(i)
            WHERE i % 3 = 0
            ORDER BY id"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(stateScan)
}
