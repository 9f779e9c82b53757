package graft

/** Contract lints over the declared-query manifest (SURVEY.md §2.12):
  * deterministic ordering in every oracle, unique names, and full oracle
  * coverage — cheap guards against silently breaking the driver's gate.
  */
class DeclarationLintSpec extends SparkSpec {

  test("every oracle has a deterministic ORDER BY") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(
        sql.toUpperCase.contains("ORDER BY"),
        s"$name oracle lacks ORDER BY — hash compare would be row-order lottery",
      )
    }
  }

  test("oracle coverage is total and names are unique") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
    assert(SparkEntry.queries.size == 167, "declared-query count changed — update SURVEY.md §2.12")
  }

  test("SCALE.md and README.md carry the live declared-query count") {
    val n = SparkEntry.queries.size
    val scale = java.nio.file.Files.readString(java.nio.file.Paths.get("SCALE.md"))
    assert(scale.contains(s"$n/$n declared queries"),
      s"SCALE.md count drifted — expected '$n/$n declared queries'")
    val readme = java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))
    assert(readme.contains(s"$n declared queries"),
      s"README.md count drifted — expected '$n declared queries'")
    assert(readme.contains(s"$n/$n vs DuckDB"),
      s"README.md gate line drifted — expected '$n/$n vs DuckDB'")
  }

  test("every declared query appears in SURVEY.md's §2.12 manifest") {
    val survey = java.nio.file.Files.readString(java.nio.file.Paths.get("SURVEY.md"))
    val missing = SparkEntry.queries.keySet.filterNot(n => survey.contains(s"`$n`"))
    assert(missing.isEmpty, s"queries missing from SURVEY.md §2.12: $missing")
  }

  test("oracles reference only driver testdata tables") {
    val tables = Set(
      "region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings",
      // table functions DuckDB provides without touching files (state_scan
      // rebuilds the V2 source's deterministic rows from a range)
      "range",
    )
    val fromRe = """(?i)(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // strip CTE names declared in this query; whatever remains must be testdata
      val cteRe = """(?i)([a-z_][a-z0-9_]*)(?:\s*\([^)]*\))?\s+AS\s*\(""".r
      val ctes = cteRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- ctes -- tables
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
