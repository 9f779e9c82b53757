package graft

/** Every declared query must run at sf0.001, return rows, and expose a
  * DuckDB oracle — the driver's correctness gate requires both halves
  * (SparkEntry.queries + SparkEntry.oracleSql).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
      // engine-wide codegen invariant: no interpreted UDF node may appear
      // in ANY declared plan — every scalar stays a Catalyst expression
      // (built-in or native graft kernel) eligible for whole-stage codegen
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        s"$name contains an interpreted UDF node")
    }
  }
}
