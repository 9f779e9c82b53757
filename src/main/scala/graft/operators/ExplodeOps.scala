package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._

/** Generators / explode surface (SURVEY.md §2.8) and the time-bucket
  * aggregation twin of the streaming path (§2.10).
  */
object ExplodeOps extends QueryModule {

  /** X1/U3 — range → rows (onefs.py:1192-1196 IP-range expansion):
    * `explode(sequence(low, high))` is a native Catalyst Generator — no
    * custom UDTF. Restricted to the 20 lowest part keys, then re-aggregated.
    */
  private val rangeExplode = DeclaredQuery(
    "range_explode",
    (s, d) =>
      part(s, d)
        .select(col("p_partkey"), col("p_size"))
        .orderBy("p_partkey")
        .limit(20)
        .select(col("p_partkey"), explode(sequence(lit(1), col("p_size"))).as("i"))
        .groupBy("p_partkey")
        .agg(count(lit(1)).as("n"), sum(col("i").cast("long")).as("total"))
        .orderBy("p_partkey"),
    Some("""WITH p AS (SELECT p_partkey, p_size FROM part ORDER BY p_partkey LIMIT 20),
                 x AS (SELECT p_partkey, unnest(generate_series(1, p_size)) AS i FROM p)
            SELECT p_partkey, count(*) AS n, CAST(sum(i) AS BIGINT) AS total
            FROM x GROUP BY p_partkey ORDER BY p_partkey"""),
  )

  /** X2 — member explosion (identities.py:305-306 secondary-group rows):
    * split a delimited column and explode to one row per member.
    */
  private val membershipExplode = DeclaredQuery(
    "membership_explode",
    (s, d) =>
      orders(s, d)
        .select(explode(split(col("o_orderpriority"), "-")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy("word"),
    Some("""SELECT word, count(*) AS n
            FROM (SELECT unnest(string_split(o_orderpriority, '-')) AS word FROM orders)
            GROUP BY word ORDER BY word"""),
  )

  /** §2.10 — tumbling-window counts, batch twin of the streaming query
    * (graft.streaming.EventStream). Bucket rendered as a string so both
    * engines agree regardless of physical timestamp unit; value summed
    * through DECIMAL(18,2) for exact cross-engine equality.
    */
  private val timeBucketAgg = DeclaredQuery(
    "time_bucket_agg",
    (s, d) =>
      events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour"),
        )
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        )
        .orderBy("hour"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1 ORDER BY hour"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(rangeExplode, membershipExplode, timeBucketAgg)
}
