package graft

import org.apache.spark.sql.SparkSession

/** The pure-SQL front door: everything the engine does is reachable with
  * `spark.sql(...)` alone after one registration call — the surface a
  * BI tool, a notebook user, or a JDBC gateway actually consumes.
  *
  *  - [[registerTables]] publishes the ten driver testdata tables as
  *    temp views (through [[Tables]], so the events-ts normalization
  *    and every pushdown property hold for SQL users too) and the
  *    native function kernels (`cosine_similarity`, `graft_poly_hash`,
  *    ...). Cluster sessions built from config get the functions plus
  *    the range-join rule via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` instead.
  *  - [[registerQueryView]] publishes any declared query's result as a
  *    `graft_<name>` temp view. Temp views store the LOGICAL plan —
  *    nothing materializes until the view is queried, and Catalyst
  *    prunes/pushes through the view boundary, so
  *    `SELECT window_end FROM graft_rolling_active_users WHERE ...`
  *    plans exactly like the DataFrame expression would.
  *
  * SqlSpec proves both: a raw-SQL ANN query over the registered views
  * matches the `cosine_topk` DataFrame result, and a view-wrapped
  * declared query is byte-identical to its direct run.
  */
object Sql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
  )

  /** Idempotent: re-registration replaces the views in place. */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    TableNames.foreach { n =>
      val df = n match {
        case "events" => Tables.events(spark, sfDir)
        case other => Tables.table(spark, sfDir, other)
      }
      df.createOrReplaceTempView(n)
    }
  }

  /** Publish one declared query as temp view `graft_<name>`; returns the
    * view name. The plan is stored lazily (a handful of queries that
    * collect bounded probe/moment tables at construction pay that
    * bounded cost here, as they would on any reference).
    */
  def registerQueryView(spark: SparkSession, sfDir: String, name: String): String = {
    val view = s"graft_$name"
    SparkEntry.queries(name)(spark, sfDir).createOrReplaceTempView(view)
    view
  }
}
