package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Temporal operators the reference lacks but a training-data/event
  * pipeline needs: as-of join (nearest prior match) and gap-based
  * sessionization — the batch twin of graft.streaming.EventStream's
  * stateful sessions.
  *
  * Both are built on the sort-merge shape (one shuffle by key, one
  * sort), NOT a range join: the union-then-window as-of scans each
  * partition once, so at 100 TB the cost is a single exchange of the two
  * event streams — there is no candidate-pair blowup to contain. Time is
  * compared in exact integer microseconds (`unix_micros` ≡ DuckDB
  * `epoch_us`), never floats.
  */
object TemporalOps extends QueryModule {

  /** 30-day event horizon → 4 h gives a mix of singleton and multi-event
    * sessions on the synthetic stream.
    */
  private val SessionGapUs = 14400000000L // 4 h in µs

  /** As-of join via tagged union + running last-non-null window — the
    * standard distributed as-of plan (one shuffle on the join key, one
    * sort per partition). For each purchase event, attribute the user's
    * most recent click at-or-before it. No pre-dedup pass: ordering the
    * window by (t, is_r DESC, r_eid) makes `last(..., ignoreNulls)` pick
    * the max-event_id click per instant for free — at equal instants the
    * right rows sort before the left (inclusive `>=` match, exactly
    * DuckDB's ASOF LEFT JOIN semantics stated by the oracle), and among
    * equal-instant right rows the largest event_id is scanned last.
    */
  private val asofJoin = DeclaredQuery(
    "asof_join",
    (s, d) => {
      val ev = events(s, d)
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("t_us"),
          col("event_type"),
        )
      val lhs = ev.filter(col("event_type") === "purchase")
      val rhs = ev.filter(col("event_type") === "click")
      val tagged = rhs
        .select(
          col("user_id"),
          col("t_us"),
          lit(1).as("is_r"),
          col("event_id").as("r_eid"),
          lit(null).cast("long").as("l_eid"),
        )
        .unionByName(
          lhs.select(
            col("user_id"),
            col("t_us"),
            lit(0).as("is_r"),
            lit(null).cast("long").as("r_eid"),
            col("event_id").as("l_eid"),
          ),
        )
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("t_us"), col("is_r").desc, col("r_eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("click_id", last(col("r_eid"), ignoreNulls = true).over(w))
        .withColumn(
          "click_t",
          last(when(col("is_r") === 1, col("t_us")), ignoreNulls = true).over(w),
        )
        .filter(col("is_r") === 0)
        .select(
          col("l_eid").as("purchase_id"),
          col("user_id"),
          col("t_us"),
          col("click_id"),
          (col("t_us") - col("click_t")).as("gap_us"),
        )
        .orderBy("purchase_id")
    },
    Some("""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events),
            l AS (SELECT event_id AS purchase_id, user_id, t_us FROM ev WHERE event_type = 'purchase'),
            r0 AS (SELECT event_id AS click_id, user_id, t_us,
                          row_number() OVER (PARTITION BY user_id, t_us ORDER BY event_id DESC) AS rn
                   FROM ev WHERE event_type = 'click'),
            r AS (SELECT click_id, user_id, t_us FROM r0 WHERE rn = 1)
            SELECT l.purchase_id, l.user_id, l.t_us, r.click_id, l.t_us - r.t_us AS gap_us
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t_us >= r.t_us
            ORDER BY l.purchase_id"""),
  )

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than the gap. lag → flag → running sum → group, entirely
    * within one partition-by-user sort (the same semantics
    * EventStream.sessionize keeps incrementally with
    * flatMapGroupsWithState).
    */
  private val sessionize = DeclaredQuery(
    "sessionize",
    (s, d) => {
      val w1 = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      val wRun = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
        .withColumn("pt", lag(col("t_us"), 1).over(w1))
        .withColumn(
          "is_new",
          when(col("pt").isNull || col("t_us") - col("pt") > SessionGapUs, 1).otherwise(0),
        )
        .withColumn("sess", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "sess")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("t_us")).as("start_us"),
          max(col("t_us")).as("end_us"),
        )
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "sess")
    },
    Some(s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
             x AS (SELECT *, lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS pt FROM ev),
             y AS (SELECT *, CASE WHEN pt IS NULL OR t_us - pt > $SessionGapUs THEN 1 ELSE 0 END AS is_new FROM x),
             z AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM y)
             SELECT user_id, sess, count(*) AS n_events, min(t_us) AS start_us,
                    max(t_us) AS end_us, max(t_us) - min(t_us) AS duration_us
             FROM z GROUP BY 1, 2 ORDER BY 1, 2"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(asofJoin, sessionize)
}
