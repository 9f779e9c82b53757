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
          Disp.roundz(col("sv").cast("double") / (col("n_vecs") * lit(1000000.0)), 6).as("c"),
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
                   (round(CAST(sv AS DOUBLE) / (n_vecs * 1000000.0), 6) + 0.0) AS c
            FROM s ORDER BY label, pos"""),
  )

  /** Misra–Gries capacity for the declared heavy-hitter query. The sketch
    * is EXACT whenever a group's distinct-key count stays ≤ k (no reduce
    * ever decrements, no merge ever truncates — merge order becomes
    * irrelevant), and the events table carries 5 event types at every SF,
    * so k = 8 makes the declared result deterministic and oracle-equal
    * while still exercising the real bounded-state sketch path. With an
    * adversarial key space the same query degrades gracefully to the
    * n/(k+1) error contract pinned in MisraGriesSpec.
    */
  private[graft] val MgK = 8

  /** Windowed heavy hitters via the mergeable Misra–Gries Aggregator —
    * the DECLARED batch twin of the streaming top-k split
    * (graft.streaming.EventStream.typeCountsWindowed feeds the same
    * ranked cut; StreamingSpec proves parity). Per hour, the sketch
    * aggregates event types in O(k) state per partial buffer, then the
    * driver-free flatMap ranks each summary to its top 3.
    *
    * At 100 TB: shuffle bytes are O(k × hours × partitions) — the raw
    * event stream never moves; partial summaries merge associatively up
    * Spark's agg tree (Agarwal et al., mergeable summaries), which is
    * exactly why this beats exact per-key counting once the key space
    * stops fitting in an executor.
    */
  private val mgHeavyHitters = DeclaredQuery(
    "mg_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val typed = events(s, d)
        .select(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"),
        )
        .as[(String, String)]
      val mg = new graft.functions.MisraGries(MgK)
      typed
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(mg.toColumn.name("summary"))
        .flatMap { case (hour, m) =>
          m.toSeq
            .sortBy { case (t, n) => (-n, t) }
            .take(3)
            .zipWithIndex
            .map { case ((t, n), i) => (hour, t, n, (i + 1).toLong) }
        }
        .toDF("hour", "event_type", "n", "rnk")
        .orderBy("hour", "rnk")
    },
    Some("""WITH c AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                              event_type, count(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT hour, event_type, n,
                         row_number() OVER (PARTITION BY hour ORDER BY n DESC, event_type) AS rnk
                  FROM c)
            SELECT hour, event_type, n, rnk FROM r WHERE rnk <= 3 ORDER BY hour, rnk"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(centroidAgg, mgHeavyHitters)
}
