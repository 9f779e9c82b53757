package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.CentroidAggregator

/** Typed-Aggregator surface: per-label embedding centroids via
  * [[graft.functions.CentroidAggregator]] (SURVEY.md §2.11 — the custom
  * `Aggregator[IN, BUF, OUT]` extension path).
  *
  * Floats are scaled to exact integer micro-units BEFORE aggregation, so
  * the distributed sum is order-invariant Long arithmetic and the
  * division back to a double happens once per (label, dim) — the only
  * way a parallel float aggregation can hash-match a single-threaded
  * oracle bit-for-bit. Output is exploded to flat (label, pos, value)
  * rows: no nested-type comparison needed.
  */
object AggregatorOps extends QueryModule {

  private val centroidAgg = DeclaredQuery(
    "centroid_agg",
    (s, d) => {
      import s.implicits._
      val scaled = embeddings(s, d)
        .select(
          col("label"),
          expr(
            "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))",
          ).as("sv"),
        )
        .as[(Int, Seq[Long])]
      scaled
        .groupByKey(_._1)
        .agg(CentroidAggregator.toColumn.name("acc"))
        .select(col("key").as("label"), col("acc._1").as("sums"), col("acc._2").as("n_vecs"))
        .select(
          col("label"),
          col("n_vecs"),
          posexplode(col("sums")).as(Seq("pos", "sv")),
        )
        .select(
          col("label"),
          col("n_vecs"),
          col("pos").cast("long").as("pos"),
          round(col("sv").cast("double") / (col("n_vecs") * lit(1000000.0)), 6).as("c"),
        )
        .orderBy("label", "pos")
    },
    Some("""WITH e AS (SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
                       FROM embeddings),
            s AS (SELECT label, pos - 1 AS pos,
                         sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS sv,
                         count(*) AS n_vecs
                  FROM e GROUP BY 1, 2)
            SELECT label, n_vecs, CAST(pos AS BIGINT) AS pos,
                   round(CAST(sv AS DOUBLE) / (n_vecs * 1000000.0), 6) AS c
            FROM s ORDER BY label, pos"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(centroidAgg)
}
