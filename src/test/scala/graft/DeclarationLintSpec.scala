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
    assert(SparkEntry.queries.size == 181, "declared-query count changed — update SURVEY.md §2.12")
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

  test("Disp.roundz pins zero's sign to +0.0") {
    // The round-10 regression class: Spark round() (BigDecimal, no -0)
    // vs DuckDB round() (IEEE sign) diverge on tiny negatives that
    // round to zero; the driver hash-compares bytes where -0.0 != +0.0.
    import org.apache.spark.sql.functions.lit
    val rows = spark
      .range(1)
      .select(
        graft.operators.Disp.roundz(lit(-1e-9), 6).as("neg"),
        graft.operators.Disp.roundz(lit(1e-9), 6).as("pos"),
        graft.operators.Disp.roundz(lit(-0.25), 2).as("nz"),
      )
      .collect()
    val (neg, pos, nz) =
      (rows(0).getDouble(0), rows(0).getDouble(1), rows(0).getDouble(2))
    assert(java.lang.Double.doubleToRawLongBits(neg) == 0L, "roundz(-1e-9) must be +0.0")
    assert(java.lang.Double.doubleToRawLongBits(pos) == 0L, "roundz(+1e-9) must be +0.0")
    assert(nz == -0.25, "roundz must not perturb nonzero values")
  }

  test("roundz never emits -0.0 over a dense sample of sign-crossing doubles") {
    import org.apache.spark.sql.functions._
    // 40k deterministic pseudo-random doubles spanning ±[1e-9, 1e3] plus
    // exact zeros — every rounded value must carry a non-negative sign
    // bit and equal plain round() elsewhere.
    val checked = spark
      .range(40000)
      .select(
        (when(col("id") % 100 === 0, lit(0.0)).otherwise(
          (col("id") % 2 * 2 - 1).cast("double") *
            expr("pow(10.0, CAST(id % 13 AS DOUBLE) - 9.0)") *
            (col("id").cast("double") / 40000.0 + 0.5),
        )).as("x"),
      )
      .select(
        col("x"),
        graft.operators.Disp.roundz(col("x"), 6).as("rz"),
        round(col("x"), 6).as("r"),
      )
      .collect()
    checked.foreach { row =>
      val (x, rz, r) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      if (rz == 0.0)
        assert(
          java.lang.Double.doubleToRawLongBits(rz) == 0L,
          s"roundz($x) rounded to zero with a negative sign bit",
        )
      else assert(rz == r, s"roundz($x) = $rz != round = $r")
    }
  }

  test("no new bare round() display sites — use Disp.roundz / SQL '+ 0.0'") {
    // Every display-rounded DOUBLE whose operand can cross zero must go
    // through Disp.roundz (Spark) and a '(round(...) + 0.0)' wrapper in
    // the oracle SQL, or the engines disagree on the sign of zero and
    // the driver's byte-hash gate flips red (round-10
    // embedding_covariance). The 36 bare sites pinned here were audited
    // as non-negative by construction (count ratios, costs, prices);
    // a changed count means a new/removed site — audit its sign range
    // and either use Disp.roundz or update this pin with the audit.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val bare = java.nio.file.Files
      .walk(root)
      .iterator()
      .asScala
      .filter(p => p.toString.endsWith(".scala") && !p.toString.endsWith("Disp.scala"))
      .map { p =>
        var t = java.nio.file.Files.readString(p)
        t = t.replaceAll("(?s)\"\"\".*?\"\"\"", "\"\"")
        t = t.replaceAll("\"(?:\\\\.|[^\"\\\\])*\"", "\"\"")
        "(?<![\\w.])round\\(".r.findAllMatchIn(t).size
      }
      .sum
    assert(bare == 36, s"bare round( display sites changed: $bare (pinned 36)")
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
