package graft

/** The pure-SQL front door (graft.Sql): registered views + native
  * functions must make every capability reachable from `spark.sql`
  * alone, planning identically to the DataFrame API.
  */
class SqlSpec extends SparkSpec {

  test("raw SQL over registered views + native kernels matches the DataFrame ANN") {
    Sql.registerTables(spark, sfDir)
    val viaSql = spark
      .sql("""WITH e AS (SELECT vec_id,
                                transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec
                         FROM embeddings),
              p AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                           round(cosine_similarity(q.dvec, c.dvec), 6) + 0.0D AS sim
                    FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id),
              r AS (SELECT qid, cid, sim,
                           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
                    FROM p)
              SELECT qid, CAST(rank AS BIGINT) AS rank, cid, sim
              FROM r WHERE rank <= 10 ORDER BY qid, rank""")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val viaDf = SparkEntry
      .queries("cosine_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(viaDf.nonEmpty && viaSql == viaDf,
      "the SQL front door must reproduce the DataFrame ANN exactly")
  }

  test("a declared query published as a view is identical to its direct run") {
    Sql.registerTables(spark, sfDir)
    val view = Sql.registerQueryView(spark, sfDir, "rolling_active_users")
    val viaView = spark
      .sql(s"SELECT * FROM $view")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val direct = SparkEntry
      .queries("rolling_active_users")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(direct.nonEmpty && viaView == direct)
    // the view boundary is transparent to Catalyst: a filtered read of
    // the view must still prune (no materialize-then-filter)
    val cutoff = direct(direct.length / 2)._1
    val filtered = spark
      .sql(s"SELECT active_users FROM $view WHERE window_end > '$cutoff'")
      .collect()
    assert(filtered.length < direct.length && filtered.nonEmpty)
    assert(filtered.length == direct.count(_._1 > cutoff))
  }

  test("a FRESH session serves the persistent catalog with zero re-registration") {
    Sql.registerPersistent(spark, sfDir)
    // newSession() = clean session state (temp views GONE) sharing the
    // catalog — the JDBC/Thrift gateway situation this tier exists for.
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2) // function registry is per-session
    val viaCatalog = s2
      .sql("""SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
              FROM graft.lineitem GROUP BY 1 ORDER BY 1""")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .toSeq
    val direct = Tables
      .table(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .toSeq
    assert(direct.nonEmpty && viaCatalog == direct,
      "the catalog view must serve the same rows as the Scala loader")
    // the events ts normalization is compiled into the view text: exact
    // integer microseconds must work from the fresh session
    val tsCount = s2
      .sql("SELECT count(*) FROM graft.events WHERE unix_micros(ts) > 0")
      .collect()(0)
      .getLong(0)
    assert(tsCount == Tables.events(spark, sfDir).count(),
      "unix_micros over the catalog events view must see every row")
    // and the session views really are absent in s2 — the catalog is
    // what crossed the boundary, not a leaked temp view
    intercept[Exception] { s2.sql("SELECT count(*) FROM lineitem").collect() }
    // a materialized query table serves cross-session too
    val table = Sql.materializeQuery(spark, sfDir, "rolling_active_users")
    val viaTable = s2
      .sql(s"SELECT * FROM $table ORDER BY window_end")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val directQ = SparkEntry
      .queries("rolling_active_users")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(directQ.nonEmpty && viaTable == directQ)
  }
}
