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
}
