package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  /** The as-of pair table (purchase_id, user_id, t_us, click_id,
    * gap_us), unordered — shared by the declared `asof_join` and the
    * `funnel_latency` rollup, so the attribution semantics cannot drift
    * between the pair list and its latency report.
    */
  private[graft] def asofPairs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
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
  }

  /** DuckDB twin of [[asofPairs]] as CTE text, ending in
    * `pairs(purchase_id, user_id, t_us, click_id, gap_us)`.
    */
  private lazy val asofPairsDuckCtes: String =
    """ev AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events),
      |l AS (SELECT event_id AS purchase_id, user_id, t_us FROM ev WHERE event_type = 'purchase'),
      |r0 AS (SELECT event_id AS click_id, user_id, t_us,
      |              row_number() OVER (PARTITION BY user_id, t_us ORDER BY event_id DESC) AS rn
      |       FROM ev WHERE event_type = 'click'),
      |r AS (SELECT click_id, user_id, t_us FROM r0 WHERE rn = 1),
      |pairs AS (SELECT l.purchase_id, l.user_id, l.t_us, r.click_id, l.t_us - r.t_us AS gap_us
      |          FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t_us >= r.t_us)""".stripMargin

  private val asofJoin = DeclaredQuery(
    "asof_join",
    (s, d) => asofPairs(s, d).orderBy("purchase_id"),
    // Composed from the SAME CTE text funnel_latency's oracle uses, so
    // the attribution semantics cannot drift on the DuckDB side either
    // (previously this was a second hand-maintained copy of the chain).
    Some(s"""WITH $asofPairsDuckCtes
             SELECT purchase_id, user_id, t_us, click_id, gap_us
             FROM pairs ORDER BY purchase_id"""),
  )

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than the gap. lag → flag → running sum → group, entirely
    * within one partition-by-user sort (the same semantics
    * EventStream.sessionize keeps incrementally with
    * flatMapGroupsWithState).
    */
  private val sessionize = DeclaredQuery(
    "sessionize",
    (s, d) => sessionTable(s, d).orderBy("user_id", "sess"),
    Some(s"""WITH $sessionDuckCtes
             SELECT user_id, sess, n_events, start_us, end_us, duration_us
             FROM sessions ORDER BY 1, 2"""),
  )

  /** The per-session table (user_id, sess, n_events, start_us, end_us,
    * duration_us), unordered — shared by the declared `sessionize` and
    * `session_stats`, so the gap semantics cannot drift between the
    * session list and its distribution report.
    */
  /** The gap-based session ASSIGNMENT — each event with its session
    * ordinal, event_type carried through (the windows ignore it): the
    * pre-aggregation stage shared by [[sessionTable]] and the
    * within-session funnel (`session_funnel`), so the gap semantics
    * cannot drift between the size reports and the conversion report.
    */
  /** [[sessionAssigned]] over an explicit events frame — the shared form
    * the streaming session-grain store applies per micro-batch
    * ([[graft.streaming.EventStream.startSessionGrain]]), so the gap
    * semantics cannot drift between the batch queries and the stream.
    */
  private[graft] def sessionAssignedFrom(ev: DataFrame): DataFrame = {
    val w1 = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    val wRun = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("t_us"),
      )
      .withColumn("pt", lag(col("t_us"), 1).over(w1))
      .withColumn(
        "is_new",
        when(col("pt").isNull || col("t_us") - col("pt") > SessionGapUs, 1).otherwise(0),
      )
      .withColumn("sess", sum(col("is_new")).over(wRun))
  }

  private def sessionAssigned(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    // Substrate-pinned (optimization round 17): the per-user window sort
    // is the corpus-sized exchange of the whole session family
    // (`sessionize`, `session_stats`, `session_funnel`, `assoc_rules`) —
    // four declared consumers re-ran it per invocation. One definition,
    // built once per session/dataset (the streaming twin keeps applying
    // [[sessionAssignedFrom]] per micro-batch, unpinned).
    graft.SubstrateCache.substrate(s, d, "session-assigned") {
      sessionAssignedFrom(events(s, d))
    }

  /** The per-slice session table over an explicit events frame. On a
    * per-user TIME-CONTIGUOUS slice these rows are session FRAGMENTS
    * that [[mergeSessionFragments]] recombines exactly: slicing a user's
    * series severs only the gap at each cut, which is precisely the gap
    * the fragment-grain merge re-evaluates.
    */
  private[graft] def sessionTableFrom(ev: DataFrame): DataFrame =
    sessionAssignedFrom(ev)
      .groupBy("user_id", "sess")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("t_us")).as("start_us"),
        max(col("t_us")).as("end_us"),
      )
      .withColumn("duration_us", col("end_us") - col("start_us"))

  private def sessionTable(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    // same agg tail as [[sessionTableFrom]], but over the PINNED
    // assignment substrate so the window sort is shared, not re-run
    sessionAssigned(s, d)
      .groupBy("user_id", "sess")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("t_us")).as("start_us"),
        max(col("t_us")).as("end_us"),
      )
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /** Recombine per-slice session fragments (user_id, n_events, start_us,
    * end_us) into the EXACT full-stream session table: the same
    * lag → flag → running-sum fold as [[sessionAssignedFrom]], one grain
    * up — fragments instead of events — so two fragments merge iff the
    * severed boundary gap is ≤ the session gap, chaining across any
    * number of slices. Requires per-user time-contiguous slices (the
    * gap grain's documented precondition); fragment rows are
    * session-cardinality, so the window input is already orders smaller
    * than the event stream.
    */
  private[graft] def mergeSessionFragments(frags: DataFrame): DataFrame = {
    val w1 = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    val wRun = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frags
      .withColumn("pe", lag(col("end_us"), 1).over(w1))
      .withColumn(
        "is_new",
        when(col("pe").isNull || col("start_us") - col("pe") > SessionGapUs, 1).otherwise(0),
      )
      .withColumn("sess", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "sess")
      .agg(
        sum(col("n_events")).as("n_events"),
        min(col("start_us")).as("start_us"),
        max(col("end_us")).as("end_us"),
      )
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** DuckDB twin of [[sessionTable]] as CTE text, ending in
    * `sessions(user_id, sess, n_events, start_us, end_us, duration_us)`;
    * the intermediate `z` is the [[sessionAssigned]] twin (event_type
    * carried for the funnel consumer).
    */
  private lazy val sessionDuckCtes: String =
    s"""ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
       |x AS (SELECT *, lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS pt FROM ev),
       |y AS (SELECT *, CASE WHEN pt IS NULL OR t_us - pt > $SessionGapUs THEN 1 ELSE 0 END AS is_new FROM x),
       |z AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM y),
       |sessions AS (SELECT user_id, sess, count(*) AS n_events, min(t_us) AS start_us,
       |                    max(t_us) AS end_us, max(t_us) - min(t_us) AS duration_us
       |             FROM z GROUP BY 1, 2)""".stripMargin

  /** Bin width for the interval join — equal to the window length, so
    * every interval covers at most TWO bins and the fan-out factor is a
    * hard constant, not data-dependent.
    */
  private val IntervalBinUs = 604800000000L // 7 days in µs

  /** Interval (range) join by BINNING — the missing-native-operator case:
    * Spark has no range-join strategy, so `probe.t BETWEEN w.start AND
    * w.end` alone plans as a BroadcastNestedLoopJoin — O(n·m) comparisons,
    * the classic 100 TB scale-killer. Binning restores an equi-join: both
    * sides key on `floor(t / binWidth)`, each window explodes into the ≤2
    * bins it covers (bin width = window length), and the exact range
    * predicate filters the equi-matched candidates. Cost: one shuffle of
    * (rows + 2·windows) keyed rows — the same plan a Databricks-style
    * range-join hint produces, expressed with stock operators.
    *
    * Semantics here: for each high-value order, count the line items
    * shipped (corpus-wide) in the 7 days from its order date. Timestamps
    * compare in exact integer microseconds; quantity sums go through
    * DECIMAL so both engines agree bit-for-bit.
    */
  private val intervalJoinBinned = DeclaredQuery(
    "interval_join_binned",
    (s, d) => {
      val win = orders(s, d)
        .filter(col("o_totalprice") > 450000)
        // orderdate/shipdate land as TIMESTAMP_NTZ from parquet; session TZ
        // is UTC so the cast to TIMESTAMP is wall-clock identity and
        // unix_micros ≡ DuckDB epoch_us
        .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("s_us"))
        .withColumn("e_us", col("s_us") + lit(IntervalBinUs))
        .withColumn(
          "bin",
          explode(sequence(
            expr(s"s_us div $IntervalBinUs"),
            expr(s"(e_us - 1) div $IntervalBinUs"),
          )),
        )
      // Push the aggregation THROUGH the join: windows overlap densely
      // (every probe falls in many windows), so joining raw probes emits
      // |matches| ≈ probes × windows-per-bin rows. Probe timestamps
      // repeat heavily (ship DATES), so pre-aggregating by exact t_us
      // shrinks the probe side ~250× and the join emits one row per
      // (window, distinct-instant) instead of per (window, probe row).
      // Counts are integers and the quantity partials are DECIMAL, so
      // the recombination is exact — same rows, same hash. When
      // timestamps don't repeat the pre-agg is a no-op pass-through,
      // never a pessimization.
      val probe = lineitem(s, d)
        .select(unix_micros(col("l_shipdate").cast("timestamp")).as("t_us"), col("l_quantity"))
        .groupBy("t_us")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty_part"),
        )
        .withColumn("bin", expr(s"t_us div $IntervalBinUs"))
      win
        .join(probe, Seq("bin"))
        .filter(col("t_us") >= col("s_us") && col("t_us") < col("e_us"))
        .groupBy("o_orderkey")
        .agg(
          sum(col("cnt")).as("n_shipped"),
          sum(col("qty_part")).cast("double").as("qty"),
        )
        .orderBy("o_orderkey")
    },
    Some(s"""SELECT o.o_orderkey, count(*) AS n_shipped,
                    CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             FROM orders o JOIN lineitem l
               ON epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
              AND epoch_us(l.l_shipdate) < epoch_us(o.o_orderdate) + $IntervalBinUs
             WHERE o.o_totalprice > 450000
             GROUP BY 1 ORDER BY 1"""),
  )

  /** Funnel window: purchase within 6 h after the click. */
  private[graft] val FunnelGapUs = 21600000000L // 6 h in µs

  /** Event-pair (funnel) join: ALL (click, purchase) pairs for the same
    * user within a bounded time window — the batch twin of a Structured
    * Streaming stream-stream join (graft.streaming.EventStream.funnelPairs
    * runs the identical semantics with watermarks; StreamingSpec proves
    * parity). The user key makes this an EQUI join — one shuffle per side,
    * with the range predicate applied post-match — so unlike a pure
    * interval join there is no candidate blowup to bin away: per-key pair
    * count is bounded by activity within the window, exactly the state
    * bound the streaming twin's watermark enforces.
    */
  private val eventPairJoin = DeclaredQuery(
    "event_pair_join",
    (s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("t_us").as("click_us"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("t_us").as("purchase_us"))
      clicks
        .join(purchases, Seq("user_id"))
        .filter(
          col("purchase_us") > col("click_us") &&
            col("purchase_us") - col("click_us") <= lit(FunnelGapUs),
        )
        .select(
          col("click_id"),
          col("purchase_id"),
          col("user_id"),
          (col("purchase_us") - col("click_us")).as("gap_us"),
        )
        .orderBy("click_id", "purchase_id")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us FROM events)
             SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
                    p.t_us - c.t_us AS gap_us
             FROM ev c JOIN ev p
               ON c.user_id = p.user_id
              AND c.event_type = 'click' AND p.event_type = 'purchase'
              AND p.t_us > c.t_us AND p.t_us - c.t_us <= $FunnelGapUs
             ORDER BY click_id, purchase_id"""),
  )

  /** Time-series resample with forward-fill: densify each user's event
    * history to a daily grid (days with no events appear with
    * n_events = 0) and carry the last known daily value forward — the
    * gap-filling step that precedes any fixed-step model input or
    * day-over-day comparison. The grid comes from exploding each user's
    * OWN [min(day), max(day)] date sequence (never a users × calendar
    * cross-join node, and no leading null-fill rows before a user's
    * first event), so total grid rows = Σ per-user spans — on a 10-year
    * corpus a user active for one week costs 7 rows, not 3 650. The
    * bounds share the daily aggregate's user_id shuffle, and the fill
    * is one partition-by-user window — so the cost is one shuffle of
    * the daily aggregates, with per-user state bounded by that user's
    * span in days. Daily values aggregate through DECIMAL; the fill
    * picks among exact decimals, so both engines carry identical values
    * forward.
    */
  private val resampleFfill = DeclaredQuery(
    "resample_ffill",
    (s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val daily = ev
        .groupBy("user_id", "day")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("day_value"),
        )
      // per-user bounds: a partial agg over the (user, day) dailies —
      // lo <= hi by construction, so sequence() never descends
      val grid = daily
        .groupBy("user_id")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("user_id"), explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val w = Window
        .partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled", last(col("day_value"), ignoreNulls = true).over(w))
        .select(
          col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("filled"), lit(0).cast("decimal(18,2)")).cast("double").as("filled_value"),
        )
        .orderBy("user_id", "day")
    },
    Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events),
            daily AS (SELECT user_id, day, count(*) AS n,
                             sum(CAST(value AS DECIMAL(18,2))) AS dv
                      FROM ev GROUP BY 1, 2),
            b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
            grid AS (SELECT user_id,
                            CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
                     FROM b),
            j AS (SELECT g.user_id, g.day, dl.n, dl.dv
                  FROM grid g LEFT JOIN daily dl USING (user_id, day)),
            f AS (SELECT user_id, day, coalesce(n, 0) AS n_events,
                         coalesce(last_value(dv IGNORE NULLS)
                                    OVER (PARTITION BY user_id ORDER BY day
                                          ROWS UNBOUNDED PRECEDING),
                                  0) AS filled
                  FROM j)
            SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(filled AS DOUBLE) AS filled_value
            FROM f ORDER BY user_id, day"""),
  )

  /** Funnel abandonment — the NEGATION of [[eventPairJoin]]: clicks with
    * NO purchase by the same user inside the window, as a LEFT ANTI join
    * on the user key with the time range as the join's residual
    * condition (Spark evaluates the extra condition inside the anti
    * join, so a click survives only if NO purchase row satisfies key AND
    * range — exactly NOT EXISTS). Same single-shuffle equi shape as the
    * pair join; the oracle states the existential directly.
    */
  private val funnelAbandon = DeclaredQuery(
    "funnel_abandon",
    (s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("t_us").as("click_us"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("t_us").as("purchase_us"))
      clicks
        .join(
          purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_us") > col("click_us") &&
            col("purchase_us") - col("click_us") <= lit(FunnelGapUs),
          "left_anti",
        )
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_abandoned"))
        .orderBy("user_id")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us FROM events),
             c AS (SELECT user_id, event_id AS click_id, t_us AS click_us
                   FROM ev WHERE event_type = 'click'),
             p AS (SELECT user_id, t_us AS purchase_us FROM ev WHERE event_type = 'purchase')
             SELECT c.user_id, count(*) AS n_abandoned
             FROM c
             WHERE NOT EXISTS (
               SELECT 1 FROM p
               WHERE p.user_id = c.user_id
                 AND p.purchase_us > c.click_us
                 AND p.purchase_us - c.click_us <= $FunnelGapUs)
             GROUP BY 1 ORDER BY 1"""),
  )

  /** Retention cohorts — the canonical product-analytics matrix: users
    * grouped by FIRST-ACTIVE day, counted on each later active day as
    * days-since-cohort. ONE data shuffle serves the whole chain: the
    * explicit `repartition(user_id)` satisfies the (user, day) distinct
    * (hash partitioning on a SUBSET of the clustering keys co-locates
    * all duplicates) AND the min-over-user window that derives the
    * cohort — deriving it with a window instead of the natural
    * groupBy+self-join matters, because the self-join would recompute
    * the activity subtree on both sides and shuffle each copy (Spark
    * shares no subtrees without an explicit cache). Only the final
    * small (cohort, days_since) count re-partitions, over
    * cohort-matrix-sized data. At 100 TB nothing wider than
    * (users × active days) rows of three small columns crosses the
    * wire, once.
    */
  private val retentionCohort = DeclaredQuery(
    "retention_cohort",
    (s, d) => {
      events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .repartition(col("user_id"))
        .distinct()
        .withColumn("cohort", min("day").over(Window.partitionBy("user_id")))
        .withColumn("days_since", datediff(col("day"), col("cohort")).cast("long"))
        .groupBy("cohort", "days_since")
        .agg(count(lit(1)).as("n_users"))
        .select(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("days_since"),
          col("n_users"),
        )
        .orderBy("cohort", "days_since")
    },
    Some("""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
            c AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
            SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort,
                   CAST(date_diff('day', c.cohort, a.day) AS BIGINT) AS days_since,
                   count(*) AS n_users
            FROM act a JOIN c USING (user_id)
            GROUP BY c.cohort, date_diff('day', c.cohort, a.day)
            ORDER BY cohort, days_since"""),
  )

  /** The (prev, next, n) first-order transition-count frame off one
    * user-keyed lag — SINGLE definition consumed by both declared
    * transition views (`event_transitions`' share matrix and
    * `transition_entropy`'s per-row conditional entropy), so the Markov
    * frame cannot drift between them (the `transitionEdges`
    * single-definition rule, one aggregation earlier).
    */
  private def transitionCounts(s: SparkSession, d: String): DataFrame =
    transitionCountsFrom(events(s, d))

  /** [[transitionCounts]] over an arbitrary events-shaped frame — the
    * per-slice half of the streaming transition grain: a micro-batch
    * slice reduces to its INTERNAL (prev, next) counts here; the one
    * transition each per-user cut severs is restored by
    * [[mergeTransitionGrain]] from the boundary grain.
    */
  private[graft] def transitionCountsFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    ev.select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
  }

  /** The boundary half of the transition grain: per user, the slice's
    * first and last event types (ties broken on event_id — the same
    * (t_us, event_id) order the lag window states), keyed so
    * consecutive slices can re-derive the one severed transition.
    * State is user-cardinality per slice, like the gap grain.
    */
  private[graft] def transitionBoundaryGrain(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
      .groupBy("user_id")
      .agg(
        min(struct(col("t_us"), col("event_id"), col("event_type"))).as("first"),
        max(struct(col("t_us"), col("event_id"), col("event_type"))).as("last"),
      )
      .select(
        col("user_id"),
        col("first.t_us").as("first_us"),
        col("first.event_id").as("first_eid"),
        col("first.event_type").as("first_type"),
        col("last.t_us").as("last_us"),
        col("last.event_type").as("last_type"),
      )

  /** Merge transition-grain parts into the full-series (prev, next, n)
    * frame: internal counts are additive; each per-user cut severed
    * EXACTLY the (previous slice's last → this slice's first)
    * transition, which the boundary grain re-derives by ordering each
    * user's slices on their first endpoint (parts-per-user = slice
    * count — the window frame is state-sized, never event-sized).
    * Associative over any per-user TIME-CONTIGUOUS slicing (the gap
    * grain's precondition); one part ≡ the batch frame.
    */
  private[graft] def mergeTransitionGrain(cnt: DataFrame, bnd: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("first_us"), col("first_eid"))
    val boundary = bnd
      .withColumn("prev", lag(col("last_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("first_type").as("next"))
      .agg(count(lit(1)).as("n"))
    cnt.unionByName(boundary).groupBy("prev", "next").agg(sum("n").as("n"))
  }

  /** The per-prev share tail over ANY (prev, next, n) frame — shared by
    * the declared `event_transitions` and the grain serve so the
    * rendered matrix cannot drift between batch and stream.
    */
  private[graft] def transitionShareTail(counts: DataFrame): DataFrame = {
    val wp = Window.partitionBy("prev")
    counts
      .withColumn("share", Disp.roundz(col("n").cast("double") / sum(col("n")).over(wp), 4))
      .orderBy("prev", "next")
  }

  /** The conditional-entropy tail over ANY (prev, next, n) frame —
    * shared by the declared `transition_entropy` and the grain serve.
    */
  private[graft] def transitionEntropyTail(counts: DataFrame): DataFrame =
    counts
      .withColumn("term_e6", expr("CAST(floor(n * ln(n) * 1000000.0 + 0.5) AS BIGINT)"))
      .groupBy("prev")
      .agg(
        sum(col("n")).as("n_out"),
        count(lit(1)).as("k_next"),
        sum(col("term_e6")).as("sum_e6"),
      )
      .withColumn(
        "entropy_e6",
        expr("""CAST(floor(ln(n_out) * 1000000.0 + 0.5) AS BIGINT)
                - CAST(floor(CAST(sum_e6 AS DOUBLE) / CAST(n_out AS DOUBLE) + 0.5) AS BIGINT)"""),
      )
      .select("prev", "n_out", "k_next", "entropy_e6")
      .orderBy("prev")

  /** The shared DuckDB statement of [[transitionCounts]] — a CTE chain
    * ending in `t(prev, next, n)`, interpolated into both consumers.
    */
  private val transitionCountsDuckCtes =
    """ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
            x AS (SELECT user_id, event_type,
                         lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev
                  FROM ev),
            t AS (SELECT prev, event_type AS next, count(*) AS n
                  FROM x WHERE prev IS NOT NULL GROUP BY 1, 2)"""

  /** First-order event-transition matrix (the Markov view of the event
    * stream): per user, each event's type paired with its predecessor's
    * via `lag` inside one partition-by-user sort, then global
    * (prev, next) counts and the per-prev row share. The share divides
    * two exact BIGINTs once — deterministic in both engines. One
    * shuffle by user for the lag, one aggregation — never a self-join.
    */
  private val eventTransitions = DeclaredQuery(
    "event_transitions",
    (s, d) => transitionShareTail(transitionCounts(s, d)),
    Some(s"""WITH $transitionCountsDuckCtes
            SELECT prev, next, n,
                   round(n::DOUBLE / sum(n) OVER (PARTITION BY prev), 4) AS share
            FROM t ORDER BY prev, next"""),
  )

  /** Conditional next-event entropy H(next | prev) per event type — the
    * predictability screen over the same Markov frame
    * `event_transitions` renders as shares: a type whose successor
    * distribution is near-uniform (entropy ≈ ln k) drives exploration
    * UI; a near-zero row is a deterministic funnel edge (compare
    * `user_type_entropy`, the same statistic one grain over). Entropy
    * is stated in the repo's µnat spelling — H = ln N − (Σ n·ln n)/N
    * with each n·ln n term ×10⁶-floored BEFORE the sum, so the
    * cross-engine value is the identical integer (the `user_type_entropy`
    * libm pin carries over verbatim).
    *
    * Scale: [[transitionCounts]] is the only corpus-touching step (one
    * user-keyed exchange + one agg); this tail aggregates a
    * |types|²-bounded frame — structure-sized, like the centrality
    * family, so the rollup is free at any corpus size.
    */
  private val transitionEntropy = DeclaredQuery(
    "transition_entropy",
    (s, d) => transitionEntropyTail(transitionCounts(s, d)),
    Some(s"""WITH $transitionCountsDuckCtes,
            tt AS (SELECT prev, n,
                          CAST(floor(n * ln(n) * 1000000.0 + 0.5) AS BIGINT) AS term_e6
                   FROM t),
            u AS (SELECT prev, CAST(sum(n) AS BIGINT) AS n_out, count(*) AS k_next,
                         CAST(sum(term_e6) AS BIGINT) AS sum_e6
                  FROM tt GROUP BY 1)
            SELECT prev, n_out, k_next,
                   CAST(floor(ln(n_out) * 1000000.0 + 0.5) AS BIGINT)
                   - CAST(floor(CAST(sum_e6 AS DOUBLE) / n_out + 0.5) AS BIGINT) AS entropy_e6
            FROM u ORDER BY prev"""),
  )

  /** Time-window event dedup — the ingest screen every at-least-once
    * event pipeline runs (producer retries, SDK double-fires, replayed
    * batches land the same logical event twice within seconds): an event
    * is a duplicate when the SAME (user, type) occurred within the
    * trailing `DedupWindowUs`. One `lag` over the (user, type)-keyed
    * sort — the sort-merge shape of the module header: a single exchange
    * of the stream keyed by (user_id, event_type), per-partition sort,
    * stateless gap predicate. No self-join, no range join — at 100 TB
    * the alternative (t BETWEEN t−Δ AND t self-join) is the BNLJ trap
    * `interval_join_binned` exists to kill, and this needs none of it
    * because "previous occurrence" is exactly what lag() is.
    *
    * Lag-vs-previous (not previous-KEPT) is the standard streaming
    * semantics (dropDuplicatesWithinWatermark): a burst of N copies
    * inside one window keeps only the first, because each copy is
    * within Δ of its predecessor. Deterministic: ts ties break on
    * event_id (the full-key sort discipline), µs integer time.
    */
  private val DedupWindowUs = 60000000L // 60 s
  private val eventDedupWindow = DeclaredQuery(
    "event_dedup_window",
    (s, d) => {
      val w = Window
        .partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      events(s, d)
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn(
          "dup",
          col("prev_us").isNotNull && col("us") - col("prev_us") < lit(DedupWindowUs),
        )
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("dup"), 1L).otherwise(0L)).as("n_dups"),
          sum(when(!col("dup"), 1L).otherwise(0L)).as("n_kept"),
        )
        .orderBy("event_type")
    },
    Some(s"""WITH x AS (SELECT event_type, epoch_us(ts) AS us,
                               lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                                       ORDER BY epoch_us(ts), event_id) AS prev_us
                        FROM events),
             f AS (SELECT event_type,
                          (prev_us IS NOT NULL AND us - prev_us < $DedupWindowUs) AS dup
                   FROM x)
             SELECT event_type,
                    count(*) AS n_events,
                    CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
                    CAST(sum(CASE WHEN dup THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
             FROM f GROUP BY 1 ORDER BY 1"""),
  )

  /** Session-size distribution — the engagement histogram (how many
    * sessions have 1, 2, … events) every product-analytics and
    * training-data-sessionization report carries. Rides [[sessionTable]]
    * verbatim (the gap semantics cannot drift from `sessionize`), then
    * ONE more size-keyed aggregation over session rows — at 100 TB the
    * session table is already orders smaller than the events (Σ sessions
    * ≤ events), and the histogram exchange is size-cardinality. Exact
    * BIGINT counts and duration sums only.
    */
  /** The session-size histogram over ANY session table — shared by the
    * declared batch query and the streaming serve
    * ([[graft.streaming.EventStream.sessionStatsFromState]]) so the
    * report cannot drift between the two paths.
    */
  private[graft] def sessionStatsFrom(sessions: DataFrame): DataFrame =
    sessions
      .groupBy("n_events")
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        // WIDE duration accumulator (round-15 census): a session's
        // duration is bounded only by its span (µs — ~10⁹ for gap-
        // bounded multi-event sessions), so a BIGINT Σ over a hot
        // n_events bucket crosses 2⁶³ at ~10⁹-10¹⁰ sessions — a 100 TB
        // corpus has more. DECIMAL(38,0) is exact; the DECLARED output
        // is BIGINT ("BIGINT means out", round-15 finding) — ANSI
        // fails the cast loudly past 2⁶³.
        sum(col("duration_us").cast("decimal(38,0)")).cast("long").as("sum_duration_us"),
      )
      .orderBy("n_events")

  private val sessionStats = DeclaredQuery(
    "session_stats",
    (s, d) => sessionStatsFrom(sessionTable(s, d)),
    Some(s"""WITH $sessionDuckCtes
             SELECT n_events, count(*) AS n_sessions,
                    count(DISTINCT user_id) AS n_users,
                    CAST(sum(duration_us) AS BIGINT) AS sum_duration_us
             FROM sessions GROUP BY 1 ORDER BY 1"""),
  )

  /** Funnel conversion rate per day — the headline funnel metric (what
    * fraction of clicks convert to a purchase within the window), the
    * aggregate consumers actually read where `event_pair_join` emits the
    * raw pairs and `funnel_abandon` the complement. A click converts iff
    * ANY same-user purchase lands in (t, t + 6 h] — LEFT SEMI on the
    * user key with the time range as residual (≡ EXISTS; the semi-join
    * stops at the first match, so a click with 50 purchases costs one
    * emit, where the pair join would emit 50). One user-keyed shuffle
    * per side, day-cardinality output, conversion as one division of
    * exact BIGINTs via the shared floor display text.
    */
  private val funnelConversion = DeclaredQuery(
    "funnel_conversion",
    (s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("t_us"), col("ts"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("user_id"),
          col("event_id"),
          col("t_us").as("click_us"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
        )
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t_us").as("purchase_us"))
      val converted = clicks
        .join(
          purchases,
          clicks("user_id") === purchases("user_id") &&
            col("purchase_us") > col("click_us") &&
            col("purchase_us") - col("click_us") <= lit(FunnelGapUs),
          "left_semi",
        )
        .groupBy("day")
        .agg(count(lit(1)).as("n_converted"))
      clicks
        .groupBy("day")
        .agg(count(lit(1)).as("n_clicks"))
        .join(converted, Seq("day"), "left")
        .na
        .fill(0L, Seq("n_converted"))
        .withColumn(
          "cr_ppm",
          expr("CAST(floor(CAST(n_converted AS DOUBLE) * 1000000.0 / n_clicks + 0.5) AS BIGINT)"),
        )
        .orderBy("day")
    },
    Some(s"""WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us,
                                strftime(ts, '%Y-%m-%d') AS day
                         FROM events),
             c AS (SELECT user_id, event_id, t_us AS click_us, day FROM ev
                   WHERE event_type = 'click'),
             conv AS (SELECT day, count(*) AS n_converted FROM c
                      WHERE EXISTS (SELECT 1 FROM ev p
                                    WHERE p.event_type = 'purchase'
                                      AND p.user_id = c.user_id
                                      AND p.t_us > c.click_us
                                      AND p.t_us - c.click_us <= $FunnelGapUs)
                      GROUP BY 1),
             clk AS (SELECT day, count(*) AS n_clicks FROM c GROUP BY 1)
             SELECT clk.day, n_clicks, coalesce(n_converted, 0) AS n_converted,
                    CAST(floor(CAST(coalesce(n_converted, 0) AS DOUBLE) * 1000000.0 / n_clicks + 0.5) AS BIGINT)
                      AS cr_ppm
             FROM clk LEFT JOIN conv ON clk.day = conv.day
             ORDER BY clk.day"""),
  )

  /** Top 3-step behavioral paths — sequence mining one order above
    * `event_transitions`' Markov pairs: the per-user (a → b → c)
    * trigrams product analytics reads as journeys and an LM-style
    * event model trains on. Same single-exchange discipline: ONE
    * user-keyed window sort feeds BOTH lags (Catalyst computes lag-1
    * and lag-2 in one Window operator — no second shuffle, no
    * self-join), then a path-cardinality agg and a
    * TakeOrderedAndProject top-20. With |event types| = E the agg
    * state is ≤ E³ rows per partition (map-side combined); at 100 TB
    * the only corpus-sized exchange is the user repartition the whole
    * temporal family already shares.
    */
  private val eventTrigrams = DeclaredQuery(
    "event_trigrams",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .withColumn("prev2", lag(col("event_type"), 2).over(w))
        .filter(col("prev2").isNotNull)
        .groupBy(col("prev2").as("e1"), col("prev").as("e2"), col("event_type").as("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    },
    Some("""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
            x AS (SELECT event_type,
                         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev,
                         lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev2
                  FROM ev)
            SELECT prev2 AS e1, prev AS e2, event_type AS e3, count(*) AS n
            FROM x WHERE prev2 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n DESC, e1, e2, e3 LIMIT 20"""),
  )

  /** Week-over-week growth — the period-over-period report every
    * operational dashboard runs: weekly event counts and value totals
    * with the growth rate vs the previous week. ISO week truncation
    * (`date_trunc('week')` is Monday-based in BOTH engines), counts and
    * DECIMAL sums are exact, and growth lands as a signed ppm integer
    * via the shared floor text (floor(x+0.5) rounds half-up identically
    * for negative growth too). The first week's growth is NULL — no
    * prior period, stated rather than faked as zero.
    *
    * Plan: one partial+final hash agg to week-cardinality rows, then a
    * single-partition lag window over WEEKS (bounded: 52 rows/year —
    * the one place a global window is correct because the domain is
    * calendar-bounded, not corpus-bounded). Order by week.
    */
  private val wowGrowth = DeclaredQuery(
    "wow_growth",
    (s, d) => {
      val w = Window.orderBy("week")
      events(s, d)
        .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        )
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn(
          "growth_ppm",
          expr(
            """CAST(floor(CAST(n - prev_n AS DOUBLE) * 1000000.0 / prev_n + 0.5) AS BIGINT)""",
          ),
        )
        .select("week", "n", "total_value", "growth_ppm")
        .orderBy("week")
    },
    Some("""WITH wk AS (SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
                               count(*) AS n,
                               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
                        FROM events GROUP BY 1),
            g AS (SELECT week, n, total_value,
                         lag(n) OVER (ORDER BY week) AS prev_n
                  FROM wk)
            SELECT week, n, total_value,
                   CAST(floor(CAST(n - prev_n AS DOUBLE) * 1000000.0 / prev_n + 0.5) AS BIGINT)
                     AS growth_ppm
            FROM g ORDER BY week"""),
  )

  /** Trailing-7-day active users — the sliding-window COUNT DISTINCT
    * every engagement dashboard runs, and a scale trap worth declaring:
    * distinct counts are NOT mergeable across window panes (a user
    * active on two days is one user), so the incremental-rollup trick
    * (`agg_state_merge`) does not apply. The scalable exact shape is:
    * (1) dedup the corpus to (day, user) grain FIRST — the only
    * corpus-sized step, one hash agg; (2) fan each (day, user) row out
    * to the ≤7 windows it can serve (arithmetic explode of SMALL rows —
    * ×7 of the deduped grain, not of the corpus); (3) one distinct-count
    * per window end. Windows are clipped to observed days via an
    * un-hinted day join. The approximate tier of the same question is
    * `sketch_union` (mergeable by design); this is the exact arm.
    */
  /** The post-grain window pipeline of `rolling_active_users`, over an
    * already-deduped (day, user_id) frame: ×≤7 arithmetic fan-out of the
    * SMALL grain rows, windows clipped to observed days, one distinct
    * per window end. Shared verbatim by the declared batch query and the
    * streaming serve ([[graft.streaming.EventStream.rollingActiveFromGrain]])
    * so the sliding-distinct semantics cannot drift between the two —
    * the DuckDB oracle on the batch arm certifies both.
    *
    * The input may carry duplicate (day, user) rows (the streaming grain
    * store appends per-batch slices); the fan-out re-distincts first, so
    * set-union IS the grain's merge algebra — the mergeable half of a
    * question whose COUNT is not mergeable.
    */
  private[graft] def rollingFromDayUser(dayUser: DataFrame): DataFrame = {
    val du = dayUser.select("day", "user_id").distinct()
    val days = du.select(col("day").as("wday")).distinct()
    du.withColumn("wday", explode(expr("sequence(day, day + 6)")))
      .join(days, Seq("wday")) // un-hinted: day-cardinality, AQE decides
      .groupBy("wday")
      .agg(countDistinct("user_id").as("active_users"))
      .select(
        date_format(date_add(lit("1970-01-01").cast("date"), col("wday").cast("int")), "yyyy-MM-dd")
          .as("window_end"),
        col("active_users"),
      )
      .orderBy("window_end")
  }

  /** Reduce raw events to the (day, user_id) grain — the only
    * corpus-sized step; batch and streaming share it.
    */
  private[graft] def toDayUserGrain(ev: DataFrame): DataFrame =
    ev.select(
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"),
      col("user_id"),
    ).distinct()

  private val rollingActiveUsers = DeclaredQuery(
    "rolling_active_users",
    (s, d) => rollingFromDayUser(toDayUserGrain(events(s, d))),
    Some("""WITH du AS (SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
                               user_id
                        FROM events),
            days AS (SELECT DISTINCT day AS wday FROM du),
            f AS (SELECT unnest(generate_series(day, day + 6)) AS wday, user_id FROM du),
            w AS (SELECT f.wday, count(DISTINCT user_id) AS active_users
                  FROM f JOIN days ON f.wday = days.wday
                  GROUP BY 1)
            SELECT strftime(DATE '1970-01-01' + CAST(wday AS INTEGER), '%Y-%m-%d') AS window_end,
                   CAST(active_users AS BIGINT) AS active_users
            FROM w ORDER BY window_end"""),
  )

  /** SCD type-2 dimension build from the event stream — the warehouse
    * pattern (Kimball's slowly-changing dimension) that turns "what is
    * each user's event_type NOW" into "what was it at any time": one row
    * per (user, run of equal consecutive types), with [valid_from,
    * valid_to) microsecond bounds and valid_to NULL on the open current
    * row. This is the batch materialization every point-in-time join
    * (`asof_join`) serves from in production.
    *
    * Plan — two windows over ONE hash partitioning: both the
    * change-point filter (lag) and the interval close (lead) partition
    * by user_id, so Catalyst plans a single exchange + sort and the
    * second window rides the first's ordering; per-user history scans
    * once per partition. At 100 TB this is one shuffle of the event
    * stream, the same bound as sessionize — no self-join, no range join.
    * Ties are impossible in the order key ((ts µs, event_id), event_id
    * unique); times are exact integer µs (`unix_micros` ≡ `epoch_us`).
    */
  private val scd2Intervals = DeclaredQuery(
    "scd2_intervals",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val changes = events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changes
        .withColumn("valid_to", lead("tus", 1).over(w))
        .select(
          col("user_id"),
          col("event_type"),
          col("tus").as("valid_from"),
          col("valid_to"),
        )
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id, event_type,
                              lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                                AS prev_type
                       FROM events),
            c AS (SELECT user_id, tus, event_id, event_type FROM e
                  WHERE prev_type IS NULL OR prev_type <> event_type)
            SELECT user_id, event_type, tus AS valid_from,
                   lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to
            FROM c ORDER BY user_id, valid_from"""),
  )

  /** Feed-freshness audit — the ingest-health gate a 100 TB multi-feed
    * pipeline runs before every training snapshot: per feed (event_type
    * stands in for the feed id), row count, last-seen timestamp, and the
    * lag behind the freshest feed, all in exact integer µs. A stale feed
    * (lag over threshold) blocks the snapshot; the threshold column
    * makes the gate a WHERE clause.
    *
    * Plan: ONE partial+final hash agg over the scan (constant state per
    * feed), then the global max folds in as a window over the PER-FEED
    * rows — single-partition, but over feed-cardinality input (the
    * `wow_growth` calendar-bounded-window rule: a global window is right
    * exactly when its input is bounded by construction). The whole audit
    * is one corpus pass — the alternative broadcast-scalar self-join
    * reads the corpus twice, which is the wrong trade at 100 TB.
    */
  private val freshnessAudit = DeclaredQuery(
    "freshness_audit",
    (s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max(unix_micros(col("ts"))).as("last_us"))
        .withColumn("lag_us", max("last_us").over(Window.partitionBy()) - col("last_us"))
        .select("event_type", "n", "last_us", "lag_us")
        .orderBy("event_type"),
    Some("""WITH per AS (SELECT event_type, count(*) AS n, max(epoch_us(ts)) AS last_us
                         FROM events GROUP BY 1)
            SELECT event_type, n, last_us,
                   (max(last_us) OVER ()) - last_us AS lag_us
            FROM per ORDER BY event_type"""),
  )

  /** Day-of-week seasonality envelope — the traffic-anomaly baseline
    * every ops dashboard draws: per (feed, weekday), observed days,
    * total events, the min/max single-day counts (the envelope an
    * alerting band sits on) and the exact-integer mean events/day in
    * ppm. Weekday comes from shared epoch-day arithmetic ((days since
    * 1970-01-01 + 4) mod 7, 0 = Sunday — 1970-01-01 was a Thursday),
    * NOT engine dow() functions (Spark's dayofweek is 1-based-Sunday,
    * DuckDB's 0-based — a silent off-by-one across engines).
    *
    * Plan: the corpus collapses to (feed, day) grain in one partial+
    * final hash agg — the only corpus-sized step; the (feed, dow)
    * envelope is a rollup OF those day rows (≤ feeds × days), the
    * two-level-agg discipline of `rolling_active_users`.
    */
  private val dowSeasonality = DeclaredQuery(
    "dow_seasonality",
    // epoch-day via µs division ≡ the former datediff(date) spelling on
    // UTC timestamps; riding the shared grain pins this derivation to
    // the continuous serving path (EventStream.startTypeDayGrain)
    (s, d) => dowEnvelopeFrom(typeDayPinned(s, d)),
    Some("""WITH byday AS (SELECT event_type,
                                  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
                                  count(*) AS dn
                           FROM events GROUP BY 1, 2),
            env AS (SELECT event_type, (day + 4) % 7 AS dow,
                           count(*) AS n_days,
                           CAST(sum(dn) AS BIGINT) AS n_events,
                           min(dn) AS min_day_n, max(dn) AS max_day_n
                    FROM byday GROUP BY 1, 2)
            SELECT event_type, dow, n_days, n_events, min_day_n, max_day_n,
                   CAST(floor(CAST(n_events AS DOUBLE) * 1000000.0 / n_days + 0.5) AS BIGINT)
                     AS mean_per_day_ppm
            FROM env ORDER BY event_type, dow"""),
  )

  /** Click→purchase attribution latency — the SLA/behavior report on
    * top of the as-of attribution: per purchase day, pair count and
    * exact p50/p90 of the click-to-purchase gap. Rides [[asofPairs]]
    * VERBATIM (and the oracle rides the same CTE chain), so the
    * latency report can never disagree with the declared `asof_join`
    * pair list about which click a purchase attributes to.
    *
    * Plan: the as-of union-window (one exchange by user) feeds a
    * day-grain percentile agg — the second exchange carries only
    * attributed pairs. Gaps are exact integer µs; percentiles hit the
    * `quantile_stats` percentile ≡ quantile_cont equivalence (at worst
    * a .5 between two integers — exact in a double). At 100 TB the
    * exact percentile buffer swaps for `histogram_quantile`'s bounded
    * state, shape unchanged.
    */
  private val funnelLatency = DeclaredQuery(
    "funnel_latency",
    (s, d) =>
      asofPairs(s, d)
        .filter(col("click_id").isNotNull)
        .groupBy(
          date_format(
            timestamp_micros(col("t_us")).cast("date"),
            "yyyy-MM-dd",
          ).as("purchase_day"),
        )
        .agg(
          count(lit(1)).as("n_pairs"),
          expr("percentile(gap_us, 0.5)").as("p50_gap_us"),
          expr("percentile(gap_us, 0.9)").as("p90_gap_us"),
        )
        .orderBy("purchase_day"),
    Some(s"""WITH $asofPairsDuckCtes
             SELECT strftime(CAST(make_timestamp(t_us) AS DATE), '%Y-%m-%d') AS purchase_day,
                    count(*) AS n_pairs,
                    quantile_cont(gap_us, 0.5) AS p50_gap_us,
                    quantile_cont(gap_us, 0.9) AS p90_gap_us
             FROM pairs WHERE click_id IS NOT NULL
             GROUP BY 1 ORDER BY 1"""),
  )

  /** Per-user behavioral diversity — Shannon entropy of the user's
    * event-type mix, the engagement/bot-screen feature (a bot hammering
    * one endpoint scores 0; a uniform 5-type user scores ln 5). Exact
    * cross-engine by the suite's integer discipline: each type's
    * c·ln(c) term quantizes to a BIGINT µnat AT THE ROW (where both
    * engines compute the identical double from identical integers — the
    * `sketch_union` ln-parity precedent), so the per-user Σ is an exact
    * integer sum, order-invariant under any partitioning; no raw double
    * is ever aggregated.
    *
    * Quantization caveat (inherited from the ln-parity precedent, stated
    * rather than hidden): `floor(c·ln(c)·10⁶ + 0.5)` depends on the
    * PLATFORM's `ln` being bit-identical between engines. Java
    * `Math.log` and DuckDB's libm are each ≤1-ulp correct but not
    * formally the SAME function; a value landing within 1 ulp of a .5
    * boundary could quantize differently. The suite pins one platform
    * (this box's JVM + DuckDB build — where the two agree on every
    * fixture value, verified tri-scale), so the hash gate is
    * deterministic HERE; porting the oracle to another libm would need
    * either a boundary audit or a shared fixed-point ln. The same pin
    * already underwrites `sketch_union`/`char_entropy`.
    *
    * Plan: (user, type) grain hash agg — the only corpus-sized step —
    * then a user-grain rollup of ≤ |types| rows each; both partial+final.
    * The µnat terms reach ~2×10¹⁶ for a 10⁹-event user, so the BIGINT
    * Σ holds to ~460 such users per group — fine at any real fan-in —
    * but `wide = true` swaps the two Σ accumulators to DECIMAL(38,0)
    * (the `embedding_covariance` knob pattern) for the pathological
    * tail; ANSI makes the BIGINT tier fail loudly at the bound
    * (Round12OpsSpec: parity in range + loud failure at magnitude).
    */
  private[graft] def userTypeEntropyFrame(
      s: SparkSession,
      d: String,
      wide: Boolean,
  ): DataFrame = {
    def acc(c: org.apache.spark.sql.Column) =
      if (wide) sum(c.cast("decimal(38,0)")) else sum(c)
    events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .withColumn("term_e6", expr("CAST(floor(c * ln(c) * 1000000.0 + 0.5) AS BIGINT)"))
      .groupBy("user_id")
      .agg(
        acc(col("c")).as("n"),
        count(lit(1)).as("k_types"),
        acc(col("term_e6")).as("sum_e6"),
      )
      .withColumn(
        "entropy_e6",
        expr("""CAST(floor(ln(n) * 1000000.0 + 0.5) AS BIGINT)
                - CAST(floor(CAST(sum_e6 AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)"""),
      )
      .select("user_id", "n", "k_types", "entropy_e6")
      .orderBy("user_id")
  }

  private val userTypeEntropy = DeclaredQuery(
    "user_type_entropy",
    (s, d) => userTypeEntropyFrame(s, d, wide = false),
    Some("""WITH ct AS (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
            t AS (SELECT user_id, c,
                         CAST(floor(c * ln(c) * 1000000.0 + 0.5) AS BIGINT) AS term_e6
                  FROM ct),
            u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS k_types,
                         CAST(sum(term_e6) AS BIGINT) AS sum_e6
                  FROM t GROUP BY 1)
            SELECT user_id, n, k_types,
                   CAST(floor(ln(n) * 1000000.0 + 0.5) AS BIGINT)
                   - CAST(floor(CAST(sum_e6 AS DOUBLE) / n + 0.5) AS BIGINT) AS entropy_e6
            FROM u ORDER BY user_id"""),
  )

  /** Cumulative unique users by day — the user-acquisition growth curve
    * every product dashboard opens with, and the OTHER sliding-distinct
    * scale lesson beside `rolling_active_users`: a cumulative COUNT
    * DISTINCT is not window-mergeable either, but unlike the trailing
    * window it REDUCES exactly — each user contributes only at their
    * FIRST-SEEN day, so one (user → min day) dedup turns the cumulative
    * distinct into a plain running SUM of day-grain new-user counts.
    *
    * Plan: (day, user) grain dedup (the only corpus-sized step — the
    * SAME [[toDayUserGrain]] substrate `rolling_active_users` reduces
    * through, so the streaming grain store serves both dashboards) →
    * (user) min-day agg → day-grain count → running sum over
    * calendar-bounded day rows (the `wow_growth`
    * single-partition-window rule). Windows are clipped to days with ≥1
    * first-seen user, which is exactly the days that exist at this
    * grain.
    */
  /** Post-grain half of `cumulative_unique_users`, over the SAME
    * (day, user) grain [[toDayUserGrain]] produces and
    * [[graft.streaming.EventStream.startDayUserGrain]] persists. The
    * first-seen reduction is a MIN — which merges correctly over any
    * union of grain slices (min over union = min of mins), so the
    * streaming store's overlapping batch dirs serve this query
    * byte-identically to batch (EventStream.cumulativeFromGrain; the
    * same algebra argument as [[rollingFromDayUser]]).
    */
  private[graft] def cumulativeFromDayUser(dayUser: DataFrame): DataFrame =
    dayUser
      .groupBy("user_id")
      .agg(min(col("day").cast("long")).as("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("new_users"))
      .withColumn(
        "cum_users",
        sum("new_users").over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      )
      .select(
        date_format(date_add(lit("1970-01-01").cast("date"), col("day").cast("int")),
          "yyyy-MM-dd").as("day"),
        col("new_users"),
        col("cum_users"),
      )
      .orderBy("day")

  private val cumulativeUniqueUsers = DeclaredQuery(
    "cumulative_unique_users",
    (s, d) => cumulativeFromDayUser(toDayUserGrain(events(s, d))),
    Some("""WITH fs AS (SELECT user_id,
                               min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS day
                        FROM events GROUP BY 1),
            nd AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
            SELECT strftime(DATE '1970-01-01' + CAST(day AS INTEGER), '%Y-%m-%d') AS day,
                   new_users,
                   CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_users
            FROM nd ORDER BY day"""),
  )

  // ---- approximate (sketch) twins of the sliding-distinct dashboards ----

  /** Occupancy-sketch register count — `sketch_union`'s exact integer
    * hash chain and m, so the approximate tier is ONE discipline
    * engine-wide, not a per-query invention.
    */
  private val SketchM = 8192L

  /** Reduce raw events to the (day, bucket) SKETCH grain — the
    * approximate counterpart of [[toDayUserGrain]]: same corpus-sized
    * dedup shape, but the second column is the user's sketch register,
    * so grain state is bounded by days × m (≈ days × 8 KB) instead of
    * days × active users. Register sets merge by UNION across any
    * slicing — the mergeability the exact distinct lacks — which is
    * exactly why this is the tier a dashboard flips to when the user
    * dimension outgrows its state budget (SCALE.md, exact/approx
    * pairing note).
    */
  private[graft] def toDayBktGrain(ev: DataFrame): DataFrame =
    ev.select(
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"),
      expr(s"""(((((user_id * 2654435761) % 2147483647)
                   ^ shiftright((user_id * 2654435761) % 2147483647, 7)) * 97381)
                % 2147483647) % $SketchM""").as("bkt"),
    ).distinct()

  /** Linear-counting estimate from v occupied registers (shared formula
    * with `sketch_union`; ln-parity discipline — identical doubles both
    * engines).
    */
  private def sketchEst(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(lit(-SketchM.toDouble) * log(lit(1.0) - least(v, lit(SketchM - 1)) / lit(SketchM.toDouble)) + lit(0.5))
      .cast("long")

  private val sketchGrainDuck: String =
    s"""sg AS (SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |              ((xor((user_id * 2654435761) % 2147483647,
       |                    (user_id * 2654435761) % 2147483647 >> 7) * 97381)
       |               % 2147483647) % $SketchM AS bkt
       |       FROM events)""".stripMargin

  private def sketchEstDuck(v: String): String =
    s"CAST(floor(-$SketchM.0 * ln(1.0 - least($v, ${SketchM - 1}) / $SketchM.0) + 0.5) AS BIGINT)"

  /** Approximate twin of `rolling_active_users`: the trailing-7-day
    * distinct served from the (day, register) sketch grain — same
    * fan-out×7 + per-window distinct pipeline, but over ≤ m rows/day,
    * with the exact count joined alongside so the error is visible in
    * the result (the `sketch_union` reporting shape). Register-set
    * union IS pane-mergeable, so unlike the exact tier this ALSO merges
    * incrementally across streaming batches with no re-distinct caveat.
    */
  /** Post-grain half of `rolling_active_sketch`, over the two grains —
    * shared verbatim by the declared batch query and the streaming
    * serve ([[graft.streaming.EventStream.rollingSketchFromGrains]]),
    * so the tiers cannot drift. Both inputs re-distinct on read, which
    * makes overlapping streaming slices free to serve: register-set
    * union (and user-set union) is exactly the merge algebra.
    */
  private[graft] def rollingSketchFrom(bktGrain: DataFrame, userGrain: DataFrame): DataFrame = {
    val g = bktGrain.select("day", "bkt").distinct()
    val days = g.select(col("day").as("wday")).distinct()
    val approx = g
      .withColumn("wday", explode(expr("sequence(day, day + 6)")))
      .join(days, Seq("wday"))
      .groupBy("wday")
      .agg(countDistinct("bkt").as("v"))
      .select(
        date_format(date_add(lit("1970-01-01").cast("date"), col("wday").cast("int")),
          "yyyy-MM-dd").as("window_end"),
        col("v"),
        sketchEst(col("v")).as("est"),
      )
    approx
      .join(
        rollingFromDayUser(userGrain)
          .select(col("window_end"), col("active_users").as("exact_active")),
        Seq("window_end"),
      )
      .orderBy("window_end")
  }

  private val rollingActiveSketch = DeclaredQuery(
    "rolling_active_sketch",
    (s, d) => rollingSketchFrom(toDayBktGrain(events(s, d)), toDayUserGrain(events(s, d))),
    Some(s"""WITH $sketchGrainDuck,
             du AS (SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
                           user_id FROM events),
             days AS (SELECT DISTINCT day AS wday FROM sg),
             f AS (SELECT unnest(generate_series(day, day + 6)) AS wday, bkt FROM sg),
             a AS (SELECT f.wday, count(DISTINCT bkt) AS v
                   FROM f JOIN days ON f.wday = days.wday GROUP BY 1),
             fe AS (SELECT unnest(generate_series(day, day + 6)) AS wday, user_id FROM du),
             e AS (SELECT fe.wday, count(DISTINCT user_id) AS exact_active
                   FROM fe JOIN days ON fe.wday = days.wday GROUP BY 1)
             SELECT strftime(DATE '1970-01-01' + CAST(a.wday AS INTEGER), '%Y-%m-%d') AS window_end,
                    CAST(a.v AS BIGINT) AS v, ${sketchEstDuck("a.v")} AS est,
                    CAST(e.exact_active AS BIGINT) AS exact_active
             FROM a JOIN e ON a.wday = e.wday
             ORDER BY window_end"""),
  )

  /** Approximate twin of `cumulative_unique_users`: the distinct-to-date
    * curve from the sketch grain. The SAME first-seen reduction works at
    * register grain — a register contributes from its first-seen day —
    * so cumulative occupancy is a min-merge + running sum, exactly the
    * exact tier's shape with m-bounded state; the exact curve rides
    * alongside for visible error.
    */
  /** Post-grain half of `cumulative_unique_sketch` — see
    * [[rollingSketchFrom]] for the sharing contract; the first-seen
    * reduction is a MIN at register grain, so overlapping slices merge
    * by the same argument as [[cumulativeFromDayUser]].
    *
    * The day axis is the EVENT-day set, not the new-register day set:
    * once the m registers saturate (users ≳ m — precisely the regime
    * the sketch tier exists for), later days occupy no new register,
    * and a curve keyed on first-occupancy days would silently stop
    * emitting rows. Both running sums are therefore left-joined onto
    * the event days and forward-filled by the running-sum window
    * itself (a missing day contributes 0 new regs / 0 new users), so
    * every active day gets a row for the whole corpus lifetime — the
    * dashboard contract a truncating inner join would break.
    */
  private[graft] def cumulativeSketchFrom(
      bktGrain: DataFrame,
      userGrain: DataFrame,
  ): DataFrame = {
    val days = bktGrain.select(col("day").cast("long").as("day")).distinct()
    val newRegs = bktGrain
      .select("day", "bkt")
      .groupBy("bkt")
      .agg(min(col("day").cast("long")).as("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("new_regs"))
    val newUsers = userGrain
      .select("day", "user_id")
      .groupBy("user_id")
      .agg(min(col("day").cast("long")).as("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("new_users"))
    val cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days
      .join(newRegs, Seq("day"), "left")
      .join(newUsers, Seq("day"), "left")
      .withColumn("v", sum(coalesce(col("new_regs"), lit(0L))).over(cum))
      .withColumn("exact_cum", sum(coalesce(col("new_users"), lit(0L))).over(cum))
      .select(
        date_format(date_add(lit("1970-01-01").cast("date"), col("day").cast("int")),
          "yyyy-MM-dd").as("day"),
        col("v"),
        sketchEst(col("v")).as("est"),
        col("exact_cum"),
      )
      .orderBy("day")
  }

  private val cumulativeUniqueSketch = DeclaredQuery(
    "cumulative_unique_sketch",
    (s, d) => cumulativeSketchFrom(toDayBktGrain(events(s, d)), toDayUserGrain(events(s, d))),
    Some(s"""WITH $sketchGrainDuck,
             days AS (SELECT DISTINCT day FROM sg),
             fs AS (SELECT bkt, min(day) AS day FROM sg GROUP BY 1),
             nd AS (SELECT day, count(*) AS new_regs FROM fs GROUP BY 1),
             duf AS (SELECT user_id,
                            min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS day
                     FROM events GROUP BY 1),
             dun AS (SELECT day, count(*) AS new_users FROM duf GROUP BY 1),
             j AS (SELECT days.day,
                          coalesce(nd.new_regs, 0) AS new_regs,
                          coalesce(dun.new_users, 0) AS new_users
                   FROM days LEFT JOIN nd ON days.day = nd.day
                             LEFT JOIN dun ON days.day = dun.day),
             a AS (SELECT day,
                          CAST(sum(new_regs) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v,
                          CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS exact_cum
                   FROM j)
             SELECT strftime(DATE '1970-01-01' + CAST(day AS INTEGER), '%Y-%m-%d') AS day,
                    v, ${sketchEstDuck("v")} AS est, exact_cum
             FROM a ORDER BY day"""),
  )

  /** First-touch attribution: each user's credit goes to the type of
    * their FIRST event ever (the `(ts, event_id)` total order every
    * temporal query here uses); a user converts if they ever purchase.
    * Per touch type: users touched, users converted, and an exact ×10⁶
    * integer conversion rate (the engine-wide integer-display
    * discipline — no cross-engine double division).
    *
    * At scale: ONE partial+final struct-min aggregation keyed by user
    * (map-side combine — the exchange carries user-cardinality grain
    * rows, not events), then a type-cardinality rollup. No window sort,
    * no join, no corpus-sized state anywhere; the grain itself is the
    * streaming store ([[toFirstTouchGrain]]).
    */
  /** Reduce raw events to the per-user FIRST-TOUCH grain — the third
    * mergeable event store (after the day-user/sketch grains): one row
    * per user carrying the argmin event over `(t_us, event_id)` (the
    * engine-wide total order; the struct-min keeps the winning event's
    * type attached) plus an OR-merged purchased flag. Both components
    * are idempotent, commutative merges — min and max — so overlapping
    * streaming slices, replays, and compaction are correct by
    * construction, exactly like the other grains.
    *
    * This is also the better BATCH shape: a partial+final struct-min
    * aggregation (map-side combine, one (user_id) exchange of user-
    * cardinality rows) replaces the row_number window's full
    * events-sized sort — at 100 TB the difference between shuffling
    * user-cardinality grain and sorting every event.
    */
  private[graft] def toFirstTouchGrain(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(
        min(struct(unix_micros(col("ts")).as("first_us"), col("event_id").as("first_id"),
          col("event_type").as("first_type"))).as("f"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchased"),
      )
      .select(
        col("user_id"),
        col("f.first_us").as("first_us"),
        col("f.first_id").as("first_id"),
        col("f.first_type").as("first_type"),
        col("purchased"),
      )

  /** Post-grain half of `first_touch_attribution` — shared verbatim by
    * the declared batch query and the streaming serve
    * ([[graft.streaming.EventStream.attributionFromGrain]]), so the
    * tiers cannot drift. The first step RE-MERGES per user (struct-min
    * + max), which is what makes overlapping slices free to serve.
    */
  private[graft] def attributionFromGrain(grain: DataFrame): DataFrame =
    grain
      .groupBy("user_id")
      .agg(
        min(struct(col("first_us"), col("first_id"), col("first_type"))).as("f"),
        max(col("purchased")).as("purchased"),
      )
      .select(col("f.first_type").as("touch"), col("purchased"))
      .groupBy("touch")
      .agg(count(lit(1)).as("touches"), sum(col("purchased")).as("conversions"))
      .withColumn("conv_rate_e6", expr("conversions * 1000000 DIV touches"))
      .orderBy("touch")

  /** Reduce raw events to the per-user LAST-TOUCH grain — the argmax
    * NON-purchase event over `(t_us, event_id)` plus the same OR-merged
    * purchased flag: struct-max (nulls skipped — a purchase-only user
    * carries a null touch) and max, both idempotent commutative merges,
    * so the store has exactly the first-touch grain's streaming
    * properties. The purchase filter is ROW-LOCAL, which is what keeps
    * the grain mergeable: "last non-purchase touch" needs no cross-slice
    * ordering, unlike "last touch before the first purchase" (which
    * would need the purchase time joined in before the argmax and stops
    * being a one-pass grain).
    */
  private[graft] def toLastTouchGrain(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(
        max(when(col("event_type") =!= "purchase",
          struct(unix_micros(col("ts")).as("last_us"), col("event_id").as("last_id"),
            col("event_type").as("last_type")))).as("l"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchased"),
      )
      .select(
        col("user_id"),
        col("l.last_us").as("last_us"),
        col("l.last_id").as("last_id"),
        col("l.last_type").as("last_type"),
        col("purchased"),
      )

  /** Post-grain half of `last_touch_attribution` — shared by the batch
    * query and the streaming serve
    * ([[graft.streaming.EventStream.lastTouchFromGrain]]). The re-merge
    * wraps the touch back into a null-when-absent struct so overlapping
    * slices merge exactly as the raw pass did.
    */
  private[graft] def lastTouchFromGrain(grain: DataFrame): DataFrame =
    grain
      .groupBy("user_id")
      .agg(
        max(when(col("last_us").isNotNull,
          struct(col("last_us"), col("last_id"), col("last_type")))).as("l"),
        max(col("purchased")).as("purchased"),
      )
      .filter(col("l").isNotNull)
      .select(col("l.last_type").as("touch"), col("purchased"))
      .groupBy("touch")
      .agg(count(lit(1)).as("touches"), sum(col("purchased")).as("conversions"))
      .withColumn("conv_rate_e6", expr("conversions * 1000000 DIV touches"))
      .orderBy("touch")

  /** Last-touch attribution — the other standard single-touch model
    * (first_touch credits discovery; last_touch credits the final
    * nudge): per non-purchase touch type, how many users end their
    * journey there and how many of them purchased at all. Same grain
    * algebra as first-touch with argmin→argmax and a row-local purchase
    * exclusion; same 100 TB shape (ONE user-keyed partial agg, no
    * window sort, no join).
    */
  private val lastTouchAttribution = DeclaredQuery(
    "last_touch_attribution",
    (s, d) => lastTouchFromGrain(toLastTouchGrain(events(s, d))),
    Some("""WITH l AS (SELECT user_id, event_type AS touch,
                              row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                       FROM events WHERE event_type <> 'purchase'),
            lt AS (SELECT user_id, touch FROM l WHERE rn = 1),
            b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
            SELECT touch, count(*) AS touches,
                   CAST(sum(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS conversions,
                   (CAST(sum(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) * 1000000)
                     // count(*) AS conv_rate_e6
            FROM lt LEFT JOIN b ON lt.user_id = b.user_id
            GROUP BY 1 ORDER BY 1"""),
  )

  private val ConvWindowUs = 7L * 86400L * 1000000L

  /** Windowed conversion attribution — the production-grade model
    * (first/last-touch credit ANY touch ever; real attribution credits
    * the last touch INSIDE a lookback window before the conversion):
    * per converting user, the first purchase (struct-min over
    * purchases) and the last non-purchase touch in the 7 days strictly
    * before it (struct-max over the windowed join); converters with no
    * qualifying touch credit 'direct' — the standard bucket. Exact-µs
    * latency from touch to conversion rides along (truncating integer
    * mean; NULL for the direct bucket in both engines). Unlike the
    * grain models this is NOT slice-mergeable (the window needs the
    * purchase time first) — it is the declared BATCH tier; the
    * streaming tier keeps serving first/last-touch from their grains.
    * Plan: two user-keyed partial aggs + one user-keyed join — no
    * window function, no events-sized sort.
    */
  private val conversionWindowAttribution = DeclaredQuery(
    "conversion_window_attribution",
    (s, d) => {
      val ev = events(s, d).select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("t_us"),
      )
      val firstPurchase = ev
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(min(struct(col("t_us"), col("event_id"))).as("p"))
        .select(col("user_id"), col("p.t_us").as("p_us"))
      val credited = ev
        .filter(col("event_type") =!= "purchase")
        .join(firstPurchase, Seq("user_id")) // un-hinted user-keyed join
        .filter(col("t_us") < col("p_us") && col("t_us") >= col("p_us") - lit(ConvWindowUs))
        .groupBy("user_id")
        .agg(
          max(struct(col("t_us"), col("event_id"), col("event_type"))).as("l"),
          max(col("p_us")).as("p_us"),
        )
        .select(
          col("user_id"),
          col("l.event_type").as("touch"),
          (col("p_us") - col("l.t_us")).as("latency_us"),
        )
      firstPurchase
        .join(credited, Seq("user_id"), "left")
        .withColumn("touch", coalesce(col("touch"), lit("direct")))
        .groupBy("touch")
        .agg(
          count(lit(1)).as("conversions"),
          // WIDE accumulator (round-15 census): latency ≤ the 7-day
          // window ≈ 6×10¹¹ µs, so a BIGINT Σ dies at ~1.5×10⁷
          // conversions per touch type. The mean always fits BIGINT;
          // truncating DIV, both engines toward zero on non-negatives.
          expr("sum(CAST(latency_us AS DECIMAL(38,0))) DIV count(1)").as("mean_latency_us"),
        )
        .orderBy("touch")
    },
    Some(s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
             fp AS (SELECT user_id, t_us AS p_us FROM (
                      SELECT user_id, t_us,
                             row_number() OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS rn
                      FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
             cr AS (SELECT user_id, event_type AS touch, p_us - t_us AS latency_us FROM (
                      SELECT e.user_id, e.event_type, e.t_us, fp.p_us,
                             row_number() OVER (PARTITION BY e.user_id
                                                ORDER BY e.t_us DESC, e.event_id DESC) AS rn
                      FROM ev e JOIN fp USING (user_id)
                      WHERE e.event_type <> 'purchase' AND e.t_us < fp.p_us
                        AND e.t_us >= fp.p_us - $ConvWindowUs) WHERE rn = 1)
             SELECT coalesce(cr.touch, 'direct') AS touch, count(*) AS conversions,
                    CAST(CAST(sum(cr.latency_us) AS HUGEINT) // count(*) AS BIGINT) AS mean_latency_us
             FROM fp LEFT JOIN cr USING (user_id)
             GROUP BY 1 ORDER BY 1"""),
  )

  private val firstTouchAttribution = DeclaredQuery(
    "first_touch_attribution",
    (s, d) => attributionFromGrain(toFirstTouchGrain(events(s, d))),
    Some("""WITH f AS (SELECT user_id, event_type AS touch,
                              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                       FROM events),
            ft AS (SELECT user_id, touch FROM f WHERE rn = 1),
            b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
            SELECT touch, count(*) AS touches,
                   CAST(sum(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS conversions,
                   (CAST(sum(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) * 1000000)
                     // count(*) AS conv_rate_e6
            FROM ft LEFT JOIN b ON ft.user_id = b.user_id
            GROUP BY 1 ORDER BY 1"""),
  )

  /** Within-session conversion funnel — `funnel_conversion`'s question
    * at SESSION grain (the product-analytics default: did the click
    * convert in the same visit, not just the same 6 hours?) crossed
    * with session depth: per size bucket, sessions, sessions containing
    * a click, and sessions converting (click AND purchase inside one
    * session) — the depth-vs-conversion curve engagement reports read.
    * Rides the SHARED [[sessionAssigned]] substrate (gap semantics
    * cannot drift from `sessionize`/`session_stats`); the flags are
    * row-local CASE maxima inside the same session agg, the bucket
    * rollup is ≤ 4 rows, and cr_ppm is exact integer division with a
    * nullif guard for clickless buckets.
    */
  private val sessionFunnel = DeclaredQuery(
    "session_funnel",
    (s, d) => {
      val per = sessionAssigned(s, d)
        .groupBy("user_id", "sess")
        .agg(
          count(lit(1)).as("n_events"),
          max(when(col("event_type") === "click", 1L).otherwise(0L)).as("has_c"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("has_p"),
        )
        .withColumn(
          "bucket",
          expr("""CASE WHEN n_events = 1 THEN '1' WHEN n_events <= 3 THEN '2-3'
                       WHEN n_events <= 7 THEN '4-7' ELSE '8+' END"""),
        )
      per
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("has_c")).as("n_with_click"),
          sum(col("has_c") * col("has_p")).as("n_converted"),
        )
        .withColumn("cr_ppm", expr("n_converted * 1000000 DIV nullif(n_with_click, 0)"))
        .orderBy("bucket")
    },
    Some(s"""WITH $sessionDuckCtes,
             ps AS (SELECT user_id, sess, count(*) AS n_events,
                           max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
                           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
                    FROM z GROUP BY 1, 2),
             pb AS (SELECT CASE WHEN n_events = 1 THEN '1' WHEN n_events <= 3 THEN '2-3'
                                WHEN n_events <= 7 THEN '4-7' ELSE '8+' END AS bucket,
                           has_c, has_p
                    FROM ps)
             SELECT bucket, count(*) AS n_sessions,
                    CAST(sum(has_c) AS BIGINT) AS n_with_click,
                    CAST(sum(has_c * has_p) AS BIGINT) AS n_converted,
                    (CAST(sum(has_c * has_p) AS BIGINT) * 1000000)
                      // nullif(CAST(sum(has_c) AS BIGINT), 0) AS cr_ppm
             FROM pb GROUP BY 1 ORDER BY 1"""),
  )

  /** Traffic anomaly queue — the consumer of `dow_seasonality`'s
    * envelope as a first-class report: the ten (type, day) cells whose
    * event count deviates most from their own day-of-week mean
    * (deploy regression, bot flood, feed outage candidates — the rows
    * an on-call dashboard surfaces first). Ranked by the division-free
    * integer deviation dev_ppm = |c·n_days − Σc|·10⁶ DIV Σc — exact at
    * any scale, no float baseline, full-key tiebreak. A top-N queue
    * rather than a fixed threshold: relative deviation shrinks as
    * per-cell counts grow (√n concentration), so any literal cutoff is
    * either empty at large sf or floods at small sf — the ranking form
    * is satisfiable at EVERY scale (the zorder_scan lesson applied to
    * thresholds).
    *
    * Scale: the (type, day)-grain agg is the only corpus-sized step
    * (the `rolling_active_users` two-level discipline); the envelope
    * rollup, the join back, and the top-10 (TakeOrderedAndProject) are
    * day-grain — calendar-bounded rows. Weekday from shared epoch-day
    * arithmetic ((day + 4) % 7) — never engine dow().
    */
  /** The (event_type, epoch-day) count grain — the calendar-bounded
    * table `traffic_anomaly` and `dow_seasonality` both reduce through,
    * and the grain the continuous traffic store persists
    * ([[graft.streaming.EventStream.startTypeDayGrain]]): counts are
    * additive, so slices merge by groupBy-sum and the served reports
    * ride the SAME [[anomalyFrom]]/[[dowEnvelopeFrom]] derivations as
    * the declared queries.
    */
  private[graft] def typeDayCounts(ev: DataFrame): DataFrame =
    // FLOOR epoch-day (pmod then exact DIV): bare truncating division
    // (Spark DIV ≡ DuckDB `//`) would put a pre-1970 timestamp on the
    // wrong calendar day (−1 µs → day 0) and disagree with the
    // date-cast spelling dow_seasonality's oracle uses (CAST AS DATE
    // floors). Both engines now state the same pmod floor — the
    // subtraction makes the numerator exactly divisible, so the
    // truncating divide IS the floor; pure integer arithmetic.
    ev.withColumn(
      "day_no",
      expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) DIV 86400000000"),
    )
      .groupBy("event_type", "day_no")
      .agg(count(lit(1)).as("c"))


  /** The batch-query form of [[typeDayCounts]], substrate-pinned
    * (optimization round 17): THIRTEEN declared trend/forecast/changepoint
    * consumers reduce through this |types|×|days|-row grain — each used to
    * re-run the corpus-sized aggregation per invocation. One definition,
    * built once per session/dataset; the streaming store keeps applying
    * the per-batch form, unpinned.
    */
  private def typeDayPinned(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.SubstrateCache.substrate(s, d, "type-day-grain")(typeDayCounts(events(s, d)))

  /** The top-10 deviation queue over (merged) day-count grain rows. */
  private[graft] def anomalyFrom(dayCounts: DataFrame): DataFrame = {
    val dd = dayCounts.withColumn("dow", expr("(day_no + 4) % 7"))
    val base = dd
      .groupBy("event_type", "dow")
      .agg(sum("c").as("sum_c"), count(lit(1)).as("n_days"))
    dd.join(base, Seq("event_type", "dow")) // day-grain × envelope: both calendar-bounded
      .withColumn("dev_ppm", expr("abs(c * n_days - sum_c) * 1000000 DIV sum_c"))
      .select("event_type", "day_no", "dow", "c", "n_days", "sum_c", "dev_ppm")
      .orderBy(col("dev_ppm").desc, col("event_type"), col("day_no"))
      .limit(10)
  }

  /** The day-of-week envelope over the same grain — `dow_seasonality`'s
    * derivation, shared with the continuous serving path.
    */
  private[graft] def dowEnvelopeFrom(dayCounts: DataFrame): DataFrame =
    dayCounts
      .withColumn("dow", ((col("day_no") + 4) % 7).cast("long"))
      .groupBy("event_type", "dow")
      .agg(
        count(lit(1)).as("n_days"),
        sum("c").as("n_events"),
        min("c").as("min_day_n"),
        max("c").as("max_day_n"),
      )
      .withColumn(
        "mean_per_day_ppm",
        expr("CAST(floor(CAST(n_events AS DOUBLE) * 1000000.0 / n_days + 0.5) AS BIGINT)"),
      )
      .select("event_type", "dow", "n_days", "n_events", "min_day_n", "max_day_n",
        "mean_per_day_ppm")
      .orderBy("event_type", "dow")

  /** CUSUM change-point detection over the same grain — the sequential
    * sibling of [[anomalyFrom]]'s pointwise queue (a level SHIFT spreads
    * small deviations over many days; no single day trips a pointwise
    * screen, but their cumulative sum peaks AT the change): per type,
    * the day where |Σ_{i≤k} (dnᵢ·D − S)| peaks — the cross-multiplied
    * integer form of cumulative (dnᵢ − mean) (×D throughout, so no
    * division ever happens; the full-series sum telescopes to exactly 0,
    * a spec-pinned invariant). The cumulative window is per-type over
    * CALENDAR-BOUNDED day rows — the wow_growth precedent for where a
    * serial window is right.
    */
  private[graft] def cusumFrom(dayCounts: DataFrame): DataFrame = {
    val tot = dayCounts
      .groupBy("event_type")
      .agg(sum("c").as("s_t"), count(lit(1)).as("d_t"))
    val wc = Window
      .partitionBy("event_type")
      .orderBy("day_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy("event_type").orderBy(abs(col("cusum")).desc, col("day_no"))
    dayCounts
      .join(tot, Seq("event_type")) // day-grain × type totals: calendar-bounded
      .withColumn("dev", col("c") * col("d_t") - col("s_t"))
      .withColumn("cusum", sum("dev").over(wc))
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") === 1)
      .select(
        col("event_type"),
        col("d_t").as("n_days"),
        col("day_no").as("cp_day"),
        col("cusum").as("cusum_peak"),
      )
      .orderBy("event_type")
  }

  /** Simple exponential smoothing over the same grain — the forecasting
    * primitive (Hyndman's SES, α = 0.3) a capacity/monitoring stack
    * keeps per feed: the recurrence L_k = α·x_k + (1−α)·L_{k−1}
    * (L₀ = x₀) restated CLOSED-FORM so the declared plan is one
    * weighted sum, not a serial fold: L_K = α·Σ_{i≥1}(1−α)^{K−i}·x_i +
    * (1−α)^K·x₀. Each term is the identical pow/multiply double text in
    * both engines (the `temperature_mix` pow precedent), ×10⁶-floored
    * AT THE TERM so the per-type sum is an exact, order-invariant
    * BIGINT. delta_e6 = level − last·10⁶ is the smoothed-vs-actual gap
    * a capacity alert thresholds on.
    *
    * Scale: rides the shared type-day grain (the corpus-sized step is
    * the grain agg); the index window and weighted sum run per type
    * over calendar-bounded day rows. Fourth consumer of one persisted
    * store (`EventStream.expSmoothFromState`).
    */
  private[graft] def expSmoothFrom(dayCounts: DataFrame): DataFrame = {
    val wi = Window.partitionBy("event_type").orderBy("day_no")
    val idx = dayCounts
      .withColumn("k", row_number().over(wi).cast("long"))
      .withColumn("kk", count(lit(1)).over(Window.partitionBy("event_type")).cast("long"))
    idx
      .withColumn(
        "term_e6",
        expr("""CAST(floor(CASE WHEN k = 1
               |                THEN pow(0.7, CAST(kk - 1 AS DOUBLE)) * c
               |                ELSE 0.3 * pow(0.7, CAST(kk - k AS DOUBLE)) * c END
               |               * 1000000.0 + 0.5) AS BIGINT)""".stripMargin),
      )
      .groupBy("event_type")
      .agg(
        max(col("kk")).as("n_days"),
        max(when(col("k") === col("kk"), col("c"))).as("last_dn"),
        sum(col("term_e6")).as("level_e6"),
      )
      .withColumn("delta_e6", expr("level_e6 - last_dn * 1000000"))
      .select("event_type", "n_days", "last_dn", "level_e6", "delta_e6")
      .orderBy("event_type")
  }

  private val expSmoothForecast = DeclaredQuery(
    "exp_smooth_forecast",
    (s, d) => expSmoothFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            ix AS (SELECT event_type, day_no, c,
                          CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_no)
                               AS BIGINT) AS k,
                          CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS kk
                   FROM dc),
            tm AS (SELECT event_type, k, kk, c,
                          CAST(floor(CASE WHEN k = 1
                                          THEN pow(0.7, CAST(kk - 1 AS DOUBLE)) * c
                                          ELSE 0.3 * pow(0.7, CAST(kk - k AS DOUBLE)) * c END
                                     * 1000000.0 + 0.5) AS BIGINT) AS term_e6
                   FROM ix)
            SELECT event_type,
                   CAST(max(kk) AS BIGINT) AS n_days,
                   CAST(max(CASE WHEN k = kk THEN c END) AS BIGINT) AS last_dn,
                   CAST(sum(term_e6) AS BIGINT) AS level_e6,
                   CAST(sum(term_e6) - max(CASE WHEN k = kk THEN c END) * 1000000 AS BIGINT)
                     AS delta_e6
            FROM tm GROUP BY 1 ORDER BY 1"""),
  )

  /** Forecast-baseline errors over the same grain — the yardstick any
    * forecast (the SES level included) must beat (Hyndman's naive and
    * seasonal-naive baselines): per feed, mean absolute error of
    * "tomorrow = today" vs "tomorrow = same weekday last week"
    * one-step forecasts. All integer: |dn_k − dn_{k−1}| and
    * |dn_k − dn_{k−7}| sums over day-grain lags, ×10³ truncating means;
    * the two-column output is the standard MASE numerator pair. Fifth
    * consumer of the shared type-day grain.
    */
  private[graft] def forecastBaselinesFrom(dayCounts: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day_no")
    dayCounts
      .withColumn("p1", lag(col("c"), 1).over(w))
      .withColumn("p7", lag(col("c"), 7).over(w))
      .groupBy("event_type")
      .agg(
        sum(when(col("p1").isNotNull, 1L).otherwise(0L)).as("n_naive"),
        sum(when(col("p1").isNotNull, abs(col("c") - col("p1"))).otherwise(0L)).as("ae_naive"),
        sum(when(col("p7").isNotNull, 1L).otherwise(0L)).as("n_seasonal"),
        sum(when(col("p7").isNotNull, abs(col("c") - col("p7"))).otherwise(0L)).as("ae_seasonal"),
      )
      .withColumn("mae_naive_e3", expr("ae_naive * 1000 DIV nullif(n_naive, 0)"))
      .withColumn("mae_seasonal_e3", expr("ae_seasonal * 1000 DIV nullif(n_seasonal, 0)"))
      .select("event_type", "n_naive", "mae_naive_e3", "n_seasonal", "mae_seasonal_e3")
      .orderBy("event_type")
  }

  private val forecastBaselines = DeclaredQuery(
    "forecast_baselines",
    (s, d) => forecastBaselinesFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            lg AS (SELECT event_type, c,
                          lag(c, 1) OVER (PARTITION BY event_type ORDER BY day_no) AS p1,
                          lag(c, 7) OVER (PARTITION BY event_type ORDER BY day_no) AS p7
                   FROM dc),
            ag AS (SELECT event_type,
                          CAST(sum(CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_naive,
                          CAST(sum(CASE WHEN p1 IS NOT NULL THEN abs(c - p1) ELSE 0 END) AS BIGINT)
                            AS ae_naive,
                          CAST(sum(CASE WHEN p7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_seasonal,
                          CAST(sum(CASE WHEN p7 IS NOT NULL THEN abs(c - p7) ELSE 0 END) AS BIGINT)
                            AS ae_seasonal
                   FROM lg GROUP BY 1)
            SELECT event_type, n_naive,
                   (ae_naive * 1000) // nullif(n_naive, 0) AS mae_naive_e3,
                   n_seasonal,
                   (ae_seasonal * 1000) // nullif(n_seasonal, 0) AS mae_seasonal_e3
            FROM ag ORDER BY event_type"""),
  )

  /** MASE of the SES one-step forecast over the same grain — the
    * quotient Hyndman's accuracy framework actually reads where
    * `forecast_baselines` ships the denominator pair and
    * `exp_smooth_forecast` the level: per feed, mean |x_{j+1} − L_j|
    * over mean |x_{j+1} − x_j|, ×10³-floored. MASE < 1000 ⟺ the
    * smoother beats naive persistence on this feed — the go/no-go a
    * capacity stack reads before trusting the SES alert level.
    *
    * The level SERIES L_j (not just L_K) comes from the same
    * closed-form per-term flooring discipline as `exp_smooth_forecast`
    * — term(i, j) = floor(w(i,j)·c_i·10⁶ + 0.5), w the α/(1−α)
    * geometric weight — evaluated as a (day_i ≤ day_j) self-join of
    * GRAIN rows: days²-per-type pairs, a TIME-SPAN property (3650 days
    * of a 10-year corpus is 6.7M pairs/type) independent of corpus
    * size; the corpus-sized step remains the shared grain agg. The
    * scaled-prefix O(days) form exists but needs (1−α)^{−i} factors
    * that overflow doubles past ~800 days — the pair form is the
    * numerically safe one, and L_K from it telescopes to exactly the
    * declared `exp_smooth_forecast` level (spec-pinned).
    *
    * Exactness: per-term floors make each L_j an order-invariant
    * BIGINT; the error sum Σ|c_{j+1}·10⁶ − L_j| accumulates in
    * DECIMAL(38,0) (the census wide tier — day counts ~10¹⁰ at 100 TB
    * put single terms at 10¹⁶ and spans at 10³ days past 2⁶³) and the
    * final MASE ratio is one integral division of wide integers,
    * declared BIGINT ("BIGINT means out"). Sixth consumer of the
    * persisted type-day store ([[graft.streaming.EventStream
    * .maseSesFromState]]).
    */
  /** The SES level SERIES (event_type, kj, level_e6) over indexed day
    * rows — every prefix's closed-form level under the identical
    * per-term flooring as `exp_smooth_forecast` (whose declared level
    * IS this series at kj = K, spec-pinned).
    */
  private[graft] def sesLevelSeries(idx: DataFrame): DataFrame = {
    val di = idx.select(
      col("event_type"),
      col("k").as("ki"),
      col("c").as("ci"),
    )
    val dj = idx.select(col("event_type"), col("k").as("kj"))
    di
      .join(dj, Seq("event_type")) // day-grain × day-grain: span-bounded
      .filter(col("ki") <= col("kj"))
      .withColumn(
        "term_e6",
        expr("""CAST(floor(CASE WHEN ki = 1
               |                THEN pow(0.7, CAST(kj - 1 AS DOUBLE)) * ci
               |                ELSE 0.3 * pow(0.7, CAST(kj - ki AS DOUBLE)) * ci END
               |               * 1000000.0 + 0.5) AS BIGINT)""".stripMargin),
      )
      .groupBy("event_type", "kj")
      .agg(sum(col("term_e6")).as("level_e6"))
  }

  private[graft] def indexedDays(dayCounts: DataFrame): DataFrame = {
    val wi = Window.partitionBy("event_type").orderBy("day_no")
    dayCounts.withColumn("k", row_number().over(wi).cast("long"))
  }

  private[graft] def maseSesFrom(dayCounts: DataFrame): DataFrame = {
    val wi = Window.partitionBy("event_type").orderBy("day_no")
    val idx = indexedDays(dayCounts)
    val levels = sesLevelSeries(idx)
    val err = idx
      .withColumn("prev_c", lag(col("c"), 1).over(wi))
      .join(
        levels.select(col("event_type"), (col("kj") + 1).as("k"), col("level_e6")),
        Seq("event_type", "k"),
      )
      .withColumn("ae_ses_e6", expr("abs(c * 1000000 - level_e6)"))
      .withColumn("ae_naive", expr("abs(c - prev_c)"))
    err
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_ses"),
        sum(col("ae_ses_e6").cast("decimal(38,0)")).as("sae_ses_e6"),
        sum(col("ae_naive").cast("decimal(38,0)")).as("sae_naive"),
      )
      .select(
        col("event_type"),
        col("n_ses"),
        expr("sae_ses_e6 DIV (n_ses * 1000)").as("mae_ses_e3"),
        expr("(sae_ses_e6 * 1000) DIV nullif(sae_naive * 1000000, 0)").as("mase_e3"),
      )
      .orderBy("event_type")
  }

  private val maseSes = DeclaredQuery(
    "mase_ses",
    (s, d) => maseSesFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            ix AS (SELECT event_type, day_no, c,
                          CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_no)
                               AS BIGINT) AS k
                   FROM dc),
            pr AS (SELECT i.event_type, i.k AS ki, i.c AS ci, j.k AS kj
                   FROM ix i JOIN ix j USING (event_type)
                   WHERE i.k <= j.k),
            lv AS (SELECT event_type, kj,
                          CAST(sum(CAST(floor(CASE WHEN ki = 1
                                                   THEN pow(0.7, CAST(kj - 1 AS DOUBLE)) * ci
                                                   ELSE 0.3 * pow(0.7, CAST(kj - ki AS DOUBLE)) * ci END
                                              * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS level_e6
                   FROM pr GROUP BY 1, 2),
            lgx AS (SELECT event_type, k, c,
                           lag(c, 1) OVER (PARTITION BY event_type ORDER BY k) AS prev_c
                    FROM ix),
            er AS (SELECT l.event_type, l.c, l.prev_c, lv.level_e6
                   FROM lgx l JOIN lv ON l.event_type = lv.event_type AND l.k = lv.kj + 1),
            ag AS (SELECT event_type,
                          CAST(count(*) AS BIGINT) AS n_ses,
                          sum(CAST(abs(c * 1000000 - level_e6) AS HUGEINT)) AS sae_ses_e6,
                          sum(CAST(abs(c - prev_c) AS HUGEINT)) AS sae_naive
                   FROM er GROUP BY 1)
            SELECT event_type, n_ses,
                   CAST(sae_ses_e6 // (n_ses * 1000) AS BIGINT) AS mae_ses_e3,
                   CAST((sae_ses_e6 * 1000) // nullif(sae_naive * 1000000, 0) AS BIGINT) AS mase_e3
            FROM ag ORDER BY event_type"""),
  )

  /** Holt-style trend-aware forecast over the same grain — the SES
    * level extended with a smoothed trend (the round-15 verdict's
    * "second geometric series over first differences"): T_K =
    * Σ_{j≥2} floor(β·(1−β)^{K−j}·ΔL_j + 0.5) with β = 0.2 over the
    * SES level series' first differences (the exact unroll of
    * T_j = β·ΔL_j + (1−β)·T_{j−1}, T_1 = 0, given the level series),
    * and forecast = L_K + T_K — the one-step-ahead a capacity planner
    * reads when traffic has drift that level-only SES lags behind.
    *
    * Exactness: ΔL_j are differences of the per-term-floored BIGINT
    * level series ([[sesLevelSeries]] — shared verbatim with
    * `mase_ses`, so the three forecasting reports read ONE level
    * definition); each trend term is the identical pow/multiply double
    * text in both engines, ×10⁶-floored AT THE TERM (floor(x + 0.5) is
    * well-defined on the negative ΔL of a falling feed), so the trend
    * sum is an exact, order-invariant BIGINT.
    *
    * Scale: rides the shared type-day grain; the level series reuses
    * the span-bounded pair join, the trend is one lag + one weighted
    * sum over day rows. Seventh consumer of the persisted store
    * ([[graft.streaming.EventStream.holtFromState]]).
    */
  private[graft] def holtForecastFrom(dayCounts: DataFrame): DataFrame = {
    val idx = indexedDays(dayCounts)
    val levels = sesLevelSeries(idx)
    val wt = Window.partitionBy("event_type")
    val wk = Window.partitionBy("event_type").orderBy("kj")
    val trend = levels
      .withColumn("prev_l", lag(col("level_e6"), 1).over(wk))
      .withColumn("kk", count(lit(1)).over(wt).cast("long"))
      .filter(col("prev_l").isNotNull)
      .withColumn(
        "t_term_e6",
        expr("""CAST(floor(0.2 * pow(0.8, CAST(kk - kj AS DOUBLE))
               |           * (level_e6 - prev_l) + 0.5) AS BIGINT)""".stripMargin),
      )
      .groupBy("event_type")
      .agg(sum(col("t_term_e6")).as("trend_e6"))
    val last = idx
      .withColumn("kk", count(lit(1)).over(wt).cast("long"))
      .filter(col("k") === col("kk"))
      .select(col("event_type"), col("kk").as("n_days"), col("c").as("last_dn"))
    val lvK = levels
      .withColumn("mk", max(col("kj")).over(wt))
      .filter(col("kj") === col("mk"))
      .select(col("event_type"), col("level_e6"))
    last
      .join(lvK, Seq("event_type"))
      .join(trend, Seq("event_type"), "left")
      .withColumn("trend_e6", coalesce(col("trend_e6"), lit(0L)))
      .withColumn("forecast_e6", col("level_e6") + col("trend_e6"))
      .select("event_type", "n_days", "last_dn", "level_e6", "trend_e6", "forecast_e6")
      .orderBy("event_type")
  }

  /** The Holt derivation as DuckDB CTEs ending in `lst`/`lvk`/`tr`
    * (last-day stats, level at K, trend) — shared by `holt_forecast`
    * and `seasonal_forecast` so the level/trend definition cannot
    * drift between them.
    */
  private lazy val holtDuckCtes = """dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            ix AS (SELECT event_type, day_no, c,
                          CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_no)
                               AS BIGINT) AS k
                   FROM dc),
            pr AS (SELECT i.event_type, i.k AS ki, i.c AS ci, j.k AS kj
                   FROM ix i JOIN ix j USING (event_type)
                   WHERE i.k <= j.k),
            lv AS (SELECT event_type, kj,
                          CAST(sum(CAST(floor(CASE WHEN ki = 1
                                                   THEN pow(0.7, CAST(kj - 1 AS DOUBLE)) * ci
                                                   ELSE 0.3 * pow(0.7, CAST(kj - ki AS DOUBLE)) * ci END
                                              * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS level_e6
                   FROM pr GROUP BY 1, 2),
            kkx AS (SELECT event_type, CAST(max(k) AS BIGINT) AS kk FROM ix GROUP BY 1),
            dl AS (SELECT event_type, kj, level_e6,
                          lag(level_e6) OVER (PARTITION BY event_type ORDER BY kj) AS prev_l
                   FROM lv),
            tr AS (SELECT d.event_type,
                          CAST(sum(CAST(floor(0.2 * pow(0.8, CAST(x.kk - d.kj AS DOUBLE))
                                              * (d.level_e6 - d.prev_l) + 0.5) AS BIGINT)) AS BIGINT)
                            AS trend_e6
                   FROM dl d JOIN kkx x USING (event_type)
                   WHERE d.prev_l IS NOT NULL GROUP BY 1),
            lst AS (SELECT i.event_type, x.kk AS n_days, i.c AS last_dn
                    FROM ix i JOIN kkx x ON i.event_type = x.event_type AND i.k = x.kk),
            lvk AS (SELECT l.event_type, l.level_e6
                    FROM lv l JOIN kkx x ON l.event_type = x.event_type AND l.kj = x.kk)"""

  /** Holt–Winters-style seasonal forecast over the same grain — the
    * dow-aware one-step-ahead (additive seasonality): forecast for the
    * NEXT calendar day = Holt level + trend + that day's weekday offset
    * s_dow = mean(count | dow) − mean(count), read straight off the
    * `dow_seasonality` envelope. The composition every capacity stack
    * runs when traffic has both drift AND a weekly cycle (SES lags
    * drift, Holt ignores the weekday dip). Eighth consumer of the
    * persisted type-day grain ([[graft.streaming.EventStream
    * .seasonalForecastFromState]]).
    *
    * Exactness: level/trend are the SHARED Holt integers; both means
    * are truncating integral divisions of exact sums — the sums ride
    * DECIMAL(38,0) before the ×10⁶ scale-up (corpus-sized counts ×10⁶
    * cross 2⁶³ at ~10¹³ rows/feed) and the offsets land as BIGINTs
    * ("BIGINT means out"). Weekday from shared epoch-day arithmetic —
    * never engine dow().
    */
  private[graft] def seasonalForecastFrom(dayCounts: DataFrame): DataFrame = {
    val holt = holtForecastFrom(dayCounts)
      .select(col("event_type"), col("level_e6"), col("trend_e6"))
    val dowAgg = dayCounts
      .withColumn("dow", ((col("day_no") + 4) % 7).cast("long"))
      .groupBy("event_type", "dow")
      .agg(sum(col("c")).as("sum_c"), count(lit(1)).as("n_days_dow"))
    val nx = dayCounts
      .groupBy("event_type")
      .agg(
        sum(col("c")).as("tot_c"),
        count(lit(1)).as("tot_days"),
        max(col("day_no")).as("last_day"),
      )
      .withColumn("next_day_no", col("last_day") + 1)
      .withColumn("next_dow", ((col("next_day_no") + 4) % 7).cast("long"))
    nx
      .join(
        dowAgg.select(
          col("event_type"),
          col("dow").as("next_dow"),
          col("sum_c"),
          col("n_days_dow"),
        ),
        Seq("event_type", "next_dow"),
        "left",
      )
      .withColumn(
        "season_e6",
        expr("""CAST(coalesce(
               |  (CAST(sum_c AS DECIMAL(38,0)) * 1000000) DIV n_days_dow
               |    - (CAST(tot_c AS DECIMAL(38,0)) * 1000000) DIV tot_days,
               |  0) AS BIGINT)""".stripMargin),
      )
      .join(holt, Seq("event_type"))
      .withColumn("forecast_e6", col("level_e6") + col("trend_e6") + col("season_e6"))
      .select(
        col("event_type"),
        col("tot_days").as("n_days"),
        col("next_day_no"),
        col("next_dow"),
        col("level_e6"),
        col("trend_e6"),
        col("season_e6"),
        col("forecast_e6"),
      )
      .orderBy("event_type")
  }

  private val seasonalForecast = DeclaredQuery(
    "seasonal_forecast",
    (s, d) => seasonalForecastFrom(typeDayPinned(s, d)),
    Some(s"""WITH $holtDuckCtes,
            dw AS (SELECT event_type, (day_no + 4) % 7 AS dow,
                          CAST(sum(c) AS BIGINT) AS sum_c,
                          CAST(count(*) AS BIGINT) AS n_days_dow
                   FROM dc GROUP BY 1, 2),
            tt AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot_c,
                          CAST(count(*) AS BIGINT) AS tot_days,
                          CAST(max(day_no) AS BIGINT) AS last_day
                   FROM dc GROUP BY 1),
            nx AS (SELECT event_type, tot_c, tot_days,
                          last_day + 1 AS next_day_no,
                          (last_day + 1 + 4) % 7 AS next_dow
                   FROM tt),
            sn AS (SELECT n.event_type, n.tot_days, n.next_day_no, n.next_dow,
                          CAST(coalesce(
                            (CAST(d.sum_c AS HUGEINT) * 1000000) // d.n_days_dow
                              - (CAST(n.tot_c AS HUGEINT) * 1000000) // n.tot_days,
                            0) AS BIGINT) AS season_e6
                   FROM nx n LEFT JOIN dw d
                     ON n.event_type = d.event_type AND n.next_dow = d.dow)
            SELECT s.event_type, s.tot_days AS n_days, s.next_day_no, s.next_dow,
                   v.level_e6,
                   CAST(coalesce(t.trend_e6, 0) AS BIGINT) AS trend_e6,
                   s.season_e6,
                   CAST(v.level_e6 + coalesce(t.trend_e6, 0) + s.season_e6 AS BIGINT)
                     AS forecast_e6
            FROM sn s JOIN lvk v USING (event_type) LEFT JOIN tr t USING (event_type)
            ORDER BY s.event_type"""),
  )

  private val holtForecast = DeclaredQuery(
    "holt_forecast",
    (s, d) => holtForecastFrom(typeDayPinned(s, d)),
    Some(s"""WITH $holtDuckCtes
            SELECT l.event_type, l.n_days, l.last_dn, v.level_e6,
                   CAST(coalesce(t.trend_e6, 0) AS BIGINT) AS trend_e6,
                   CAST(v.level_e6 + coalesce(t.trend_e6, 0) AS BIGINT) AS forecast_e6
            FROM lst l JOIN lvk v USING (event_type) LEFT JOIN tr t USING (event_type)
            ORDER BY l.event_type"""),
  )

  /** Mann–Kendall trend test per feed (Mann 1945 / Kendall 1975 — THE
    * nonparametric "is this series trending" test monitoring stacks
    * run): S = Σ_{i<j} sign(c_j − c_i) over the day grain, variance
    * with the tie correction, z against the normal approximation.
    * Ninth consumer of the persisted (type, day) grain
    * ([[graft.streaming.EventStream.mannKendallFromState]]).
    *
    * Exactness: S and the ×18-scaled variance are pure integers (the
    * pair space is days², calendar-bounded); z's divide-and-sqrt is one
    * shared double chain from those integers, ×10³-floored; a
    * zero-variance series (constant counts or n < 2) emits NULL rather
    * than a fabricated z (nullif in both engines).
    */
  private[graft] def mannKendallFrom(dayCounts: DataFrame): DataFrame = {
    val a = dayCounts.select(col("event_type"), col("day_no").as("da"), col("c").as("ca"))
    val b = dayCounts.select(col("event_type").as("et2"), col("day_no").as("db"), col("c").as("cb"))
    val s = a
      .join(b, col("event_type") === col("et2") && col("da") < col("db"))
      .groupBy("event_type")
      .agg(
        sum(
          when(col("cb") > col("ca"), 1L).when(col("cb") < col("ca"), -1L).otherwise(0L),
        ).as("s_stat"),
      )
    val n = dayCounts.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val ties = dayCounts
      .groupBy("event_type", "c")
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    n.join(s, Seq("event_type"), "left")
      .join(ties, Seq("event_type"))
      .na
      .fill(0L, Seq("s_stat"))
      .withColumn("var18", expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"))
      .withColumn(
        "z_e3",
        expr(
          """CAST(floor((CAST(s_stat AS DOUBLE)
            | - CASE WHEN s_stat > 0 THEN 1.0 WHEN s_stat < 0 THEN -1.0 ELSE 0.0 END)
            | / sqrt(CAST(nullif(var18, 0) AS DOUBLE) / 18.0) * 1000.0 + 0.5) AS BIGINT)""".stripMargin,
        ),
      )
      .select(col("event_type"), col("n_days"), col("s_stat"), col("var18"), col("z_e3"))
      .orderBy("event_type")
  }

  /** Theil–Sen robust trend slope per feed (Theil 1950 / Sen 1968 — the
    * median-of-pairwise-slopes estimator that shrugs off the outlier
    * days the anomaly queue flags): slopes ×10⁶-floored per pair (one
    * shared double chain — exact-int products stay under 2⁵³ so the
    * IEEE divide is bit-identical), then the EXACT doubled median
    * (sum of the two middle order statistics; 2× the middle when odd)
    * so no fractional value ever crosses an engine boundary. Tenth
    * consumer of the same grain
    * ([[graft.streaming.EventStream.theilSenFromState]]).
    */
  private[graft] def theilSenFrom(dayCounts: DataFrame): DataFrame = {
    val a = dayCounts.select(col("event_type"), col("day_no").as("da"), col("c").as("ca"))
    val b = dayCounts.select(col("event_type").as("et2"), col("day_no").as("db"), col("c").as("cb"))
    val slopes = a
      .join(b, col("event_type") === col("et2") && col("da") < col("db"))
      .withColumn(
        "slope_e6",
        expr("CAST(floor(CAST(cb - ca AS DOUBLE) * 1000000.0 / (db - da)) AS BIGINT)"),
      )
    val wr = Window
      .partitionBy("event_type")
      .orderBy(col("slope_e6"), col("da"), col("db")) // full-key: order stats stable
    val ranked = slopes.withColumn("rk", row_number().over(wr).cast("long"))
    val np = ranked.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
    ranked
      .join(np, Seq("event_type")) // pair-grain × type counts: calendar-bounded
      .groupBy("event_type", "n_pairs")
      .agg(
        (sum(when(col("rk") === expr("(n_pairs + 1) DIV 2"), col("slope_e6")).otherwise(0L))
          + sum(when(col("rk") === expr("n_pairs DIV 2 + 1"), col("slope_e6")).otherwise(0L)))
          .as("slope_med2_e6"),
      )
      .select(col("event_type"), col("n_pairs"), col("slope_med2_e6"))
      .orderBy("event_type")
  }

  private val mannKendall = DeclaredQuery(
    "mann_kendall",
    (s, d) => mannKendallFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            p AS (SELECT a.event_type,
                         CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sg
                  FROM dc a JOIN dc b
                    ON a.event_type = b.event_type AND a.day_no < b.day_no),
            sS AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat FROM p GROUP BY 1),
            n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM dc GROUP BY 1),
            tt AS (SELECT event_type, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
                   FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
                         FROM dc GROUP BY 1, 2) GROUP BY 1),
            v AS (SELECT n.event_type, n.n_days,
                         CAST(coalesce(sS.s_stat, 0) AS BIGINT) AS s_stat,
                         CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - tt.tie_term
                              AS BIGINT) AS var18
                  FROM n LEFT JOIN sS ON n.event_type = sS.event_type
                         JOIN tt ON n.event_type = tt.event_type)
            SELECT event_type, n_days, s_stat, var18,
                   CAST(floor((CAST(s_stat AS DOUBLE)
                        - CASE WHEN s_stat > 0 THEN 1.0 WHEN s_stat < 0 THEN -1.0 ELSE 0.0 END)
                        / sqrt(CAST(nullif(var18, 0) AS DOUBLE) / 18.0) * 1000.0 + 0.5) AS BIGINT)
                     AS z_e3
            FROM v ORDER BY event_type"""),
  )

  private val theilSen = DeclaredQuery(
    "theil_sen",
    (s, d) => theilSenFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            p AS (SELECT a.event_type, a.day_no AS da, b.day_no AS db,
                         CAST(floor(CAST(b.c - a.c AS DOUBLE) * 1000000.0 / (b.day_no - a.day_no)) AS BIGINT) AS slope_e6
                  FROM dc a JOIN dc b
                    ON a.event_type = b.event_type AND a.day_no < b.day_no),
            r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY slope_e6, da, db) AS BIGINT) AS rk FROM p),
            np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1)
            SELECT r.event_type, np.n_pairs,
                   CAST(sum(CASE WHEN r.rk = (np.n_pairs + 1) // 2 THEN r.slope_e6 ELSE 0 END)
                      + sum(CASE WHEN r.rk = np.n_pairs // 2 + 1 THEN r.slope_e6 ELSE 0 END)
                        AS BIGINT) AS slope_med2_e6
            FROM r JOIN np USING (event_type)
            GROUP BY 1, 2 ORDER BY r.event_type"""),
  )

  /** Lag-7 sample autocorrelation per feed (Box & Jenkins) — the
    * weekly-seasonality STRENGTH statistic beside `dow_seasonality`'s
    * per-weekday envelope: r₇ near 1 means the feed repeats weekly (the
    * envelope is trustworthy), near 0 means the dow means are noise.
    * The series is the type-day grain DENSIFIED to its calendar span
    * (missing days are real zeros for an arrival-count process — the
    * sparse grain would silently splice non-adjacent days together).
    *
    * Exactness: r₇ = Σ(x_t−x̄)(x_{t+7}−x̄) / Σ(x_t−x̄)², multiplied
    * through by n² so every term is an exact integer — num = n²·Σx_tx_{t+7}
    * − n·S·(Σhead+Σtail) + (n−7)·S², den = n²·Σx² − n·S² — on
    * DECIMAL(38,0) accumulators (products reach days²·counts²; the
    * magnitude census crosses 2⁶³ for any web-scale feed) with ONE
    * truncating integral division ×10⁶ and BIGINT out. Truncation
    * toward zero is engine-identical at BOTH signs (Spark DIV ≡ DuckDB
    * `//` on HUGEINT — Round17OpsSpec pins the negative case). NULL
    * when the span has no lag-7 pair or zero variance.
    *
    * Scale: the only corpus-sized step is the shared day-grain
    * reduction; densify, the 7-shifted self-join, and the moment aggs
    * are calendar-bounded. Eleventh consumer of the persisted type-day
    * grain ([[graft.streaming.EventStream.acfLag7FromState]]).
    */
  private[graft] def acfLag7From(dayCounts: DataFrame): DataFrame = {
    val spans = dayCounts
      .groupBy("event_type")
      .agg(min("day_no").as("d0"), max("day_no").as("d1"))
    val dense = spans
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day_no"))
      .join(dayCounts, Seq("event_type", "day_no"), "left")
      .withColumn("x", coalesce(col("c"), lit(0L)))
      .select("event_type", "day_no", "x")
    val shifted = dense.select(
      col("event_type"),
      (col("day_no") - 7L).as("day_no"),
      col("x").as("y"),
    )
    val cross = dense
      .join(shifted, Seq("event_type", "day_no")) // t and t+7 both in span
      .groupBy("event_type")
      .agg(
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(col("x")).as("sh"),
        sum(col("y")).as("st"),
      )
    dense
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("x").as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      )
      .join(cross, Seq("event_type"), "left")
      .withColumn(
        "num",
        expr("""CAST(n_days AS DECIMAL(38,0)) * n_days * sxy
               | - CAST(n_days AS DECIMAL(38,0)) * s * (sh + st)
               | + CAST(n_days - 7 AS DECIMAL(38,0)) * s * s""".stripMargin),
      )
      .withColumn(
        "den",
        expr("CAST(n_days AS DECIMAL(38,0)) * n_days * sxx - CAST(n_days AS DECIMAL(38,0)) * s * s"),
      )
      .withColumn("r7_e6", expr("CAST((num * 1000000) DIV nullif(den, 0) AS BIGINT)"))
      .select(col("event_type"), col("n_days"), col("s").as("sum_c"), col("r7_e6"))
      .orderBy("event_type")
  }

  private val acfLag7 = DeclaredQuery(
    "acf_lag7",
    (s, d) => acfLag7From(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            sp AS (SELECT event_type, min(day_no) AS d0, max(day_no) AS d1 FROM dc GROUP BY 1),
            dn0 AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day_no FROM sp),
            dn AS (SELECT dn0.event_type, dn0.day_no, CAST(coalesce(dc.c, 0) AS BIGINT) AS x
                   FROM dn0 LEFT JOIN dc
                     ON dc.event_type = dn0.event_type AND dc.day_no = dn0.day_no),
            cr AS (SELECT a.event_type,
                          sum(CAST(a.x AS HUGEINT) * b.x) AS sxy,
                          CAST(sum(a.x) AS BIGINT) AS sh,
                          CAST(sum(b.x) AS BIGINT) AS st
                   FROM dn a JOIN dn b
                     ON a.event_type = b.event_type AND b.day_no = a.day_no + 7
                   GROUP BY 1),
            tt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                          CAST(sum(x) AS BIGINT) AS s,
                          sum(CAST(x AS HUGEINT) * x) AS sxx
                   FROM dn GROUP BY 1),
            j AS (SELECT tt.event_type, tt.n_days, tt.s, tt.sxx, cr.sxy, cr.sh, cr.st,
                         CAST(tt.n_days AS HUGEINT) * tt.n_days * cr.sxy
                           - CAST(tt.n_days AS HUGEINT) * tt.s * (cr.sh + cr.st)
                           + CAST(tt.n_days - 7 AS HUGEINT) * tt.s * tt.s AS num,
                         CAST(tt.n_days AS HUGEINT) * tt.n_days * tt.sxx
                           - CAST(tt.n_days AS HUGEINT) * tt.s * tt.s AS den
                  FROM tt LEFT JOIN cr ON tt.event_type = cr.event_type)
            SELECT event_type, n_days, s AS sum_c,
                   CAST((num * 1000000) // nullif(den, 0) AS BIGINT) AS r7_e6
            FROM j ORDER BY event_type"""),
  )

  private val cusumChangepoint = DeclaredQuery(
    "cusum_changepoint",
    (s, d) => cusumFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s_t,
                           CAST(count(*) AS BIGINT) AS d_t
                    FROM dc GROUP BY 1),
            cu AS (SELECT dc.event_type, dc.day_no, t.d_t,
                          CAST(sum(dc.c * t.d_t - t.s_t)
                               OVER (PARTITION BY dc.event_type ORDER BY dc.day_no
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
                   FROM dc JOIN tot t USING (event_type)),
            r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                               ORDER BY abs(cusum) DESC, day_no) AS rk
                  FROM cu)
            SELECT event_type, d_t AS n_days, day_no AS cp_day, cusum AS cusum_peak
            FROM r WHERE rk = 1 ORDER BY event_type"""),
  )

  /** Pettitt change-point test per feed (Pettitt 1979) — the RANK-based
    * companion to `cusum_changepoint`: U_t = Σ_{i≤t}Σ_{j>t} sgn(xᵢ−xⱼ)
    * peaks where the day-count distribution's MEDIAN shifts, immune to
    * the single-outlier days that drag a mean-based CUSUM (a one-day
    * traffic spike moves Σ(x−x̄) a lot, a rank sum by one). The pair
    * double-sum collapses to a running sum of per-day rank scores:
    * U_t = Σ_{i≤t} sᵢ with sᵢ = #{x<xᵢ} − #{x>xᵢ} = 2·cntlt + tie − n
    * read off the per-type VALUE GRAIN (the `mann_whitney` midrank
    * construction, partitioned by feed) — O(days) work, never the
    * O(days²) pair frame. All integers exact (|U| ≤ n²: calendar-
    * bounded forever); t ranges 1..n−1 by definition, ties on |U|
    * break to the earliest day.
    *
    * Scale: rides the shared type-day grain (the corpus-sized step);
    * the value-grain window and the day-order running sum run per type
    * over calendar-bounded rows.
    */
  private[graft] def pettittFrom(dayCounts: DataFrame): DataFrame = {
    val hist = dayCounts.groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
    val wv = Window
      .partitionBy("event_type")
      .orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("cumlt", coalesce(sum("cnt").over(wv), lit(0L)))
      .select(col("event_type"), col("c"), col("cumlt"), col("cnt"))
    val tot = dayCounts.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val wd = Window
      .partitionBy("event_type")
      .orderBy("day_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy("event_type").orderBy(abs(col("u")).desc, col("day_no"))
    dayCounts
      .join(ranked, Seq("event_type", "c")) // day-grain × value grain: calendar-bounded
      .join(tot, Seq("event_type"))
      .withColumn("s_i", lit(2L) * col("cumlt") + col("cnt") - col("n_days"))
      .withColumn("u", sum("s_i").over(wd))
      .withColumn("last_day", max("day_no").over(Window.partitionBy("event_type")))
      .filter(col("day_no") < col("last_day"))
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") === 1)
      .select(
        col("event_type"),
        col("n_days"),
        col("day_no").as("cp_day"),
        abs(col("u")).as("k_stat"),
        col("u").as("u_peak"),
      )
      .orderBy("event_type")
  }

  private val pettittChangepoint = DeclaredQuery(
    "pettitt_changepoint",
    (s, d) => pettittFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            hist AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt FROM dc GROUP BY 1, 2),
            rkv AS (SELECT event_type, c, cnt,
                           coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt
                    FROM hist),
            tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM dc GROUP BY 1),
            sv AS (SELECT dc.event_type, dc.day_no,
                          2 * r.cumlt + r.cnt - t.n_days AS s_i, t.n_days
                   FROM dc JOIN rkv r ON dc.event_type = r.event_type AND dc.c = r.c
                           JOIN tot t ON dc.event_type = t.event_type),
            u AS (SELECT event_type, day_no, n_days,
                         CAST(sum(s_i) OVER (PARTITION BY event_type ORDER BY day_no
                                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u,
                         max(day_no) OVER (PARTITION BY event_type) AS last_day
                  FROM sv),
            p AS (SELECT event_type, day_no, n_days, u,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY abs(u) DESC, day_no) AS rk2
                  FROM u WHERE day_no < last_day)
            SELECT event_type, n_days, day_no AS cp_day, abs(u) AS k_stat, u AS u_peak
            FROM p WHERE rk2 = 1 ORDER BY event_type"""),
  )

  /** Classical additive decomposition of each feed's day-count series —
    * trend (7-observation centered moving mean), weekday seasonal
    * (per-dow mean of the detrended series), residual: the STL-lite
    * read `dow_seasonality` (envelope only) and `seasonal_forecast`
    * (one-step level) don't expose — the full per-day decomposition a
    * capacity dashboard plots, and the residual stream anomaly rules
    * actually want (deviation AFTER trend and weekday are explained).
    *
    * Exactness: everything is integer-exact under explicit scaling —
    * trend·7 is a 7-row window SUM, the detrended series rides as
    * 7c − trend₇, the seasonal is one truncating DIV of Σdetr₇·10⁶ by
    * 7m, and the residual is the exact difference of the three ×10⁶
    * terms. Rows without a complete centered window are out by
    * definition (count-7 guard). Truncating DIV at both signs is
    * engine-identical (Spark DIV ≡ DuckDB //).
    *
    * Scale: rides the shared type-day grain; all windows are per-type
    * over calendar-bounded day rows.
    */
  private[graft] def seasonalDecomposeFrom(dayCounts: DataFrame): DataFrame = {
    val w7 = Window.partitionBy("event_type").orderBy("day_no").rowsBetween(-3, 3)
    val complete = dayCounts
      .withColumn("trend_x7", sum("c").over(w7))
      .withColumn("wn", count(lit(1)).over(w7))
      .filter(col("wn") === 7L)
      .withColumn("dow", expr("(day_no + 4) % 7"))
      .withColumn("detr_x7", lit(7L) * col("c") - col("trend_x7"))
    val seas = complete
      .groupBy("event_type", "dow")
      .agg(sum("detr_x7").as("sdetr"), count(lit(1)).as("m"))
      .withColumn("seas_e6", expr("(sdetr * 1000000) DIV (7 * m)"))
      .select("event_type", "dow", "seas_e6")
    complete
      .join(seas, Seq("event_type", "dow"))
      .withColumn("trend_e6", expr("(trend_x7 * 1000000) DIV 7"))
      .withColumn("resid_e6", col("c") * lit(1000000L) - col("trend_e6") - col("seas_e6"))
      .select("event_type", "day_no", "dow", "c", "trend_e6", "seas_e6", "resid_e6")
      .orderBy("event_type", "day_no")
  }

  private val seasonalDecompose = DeclaredQuery(
    "seasonal_decompose",
    (s, d) => seasonalDecomposeFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            tw AS (SELECT event_type, day_no, c,
                          CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day_no
                                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS trend_x7,
                          count(*) OVER (PARTITION BY event_type ORDER BY day_no
                                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
                   FROM dc),
            comp AS (SELECT event_type, day_no, c, trend_x7,
                            (day_no + 4) % 7 AS dow,
                            7 * c - trend_x7 AS detr_x7
                     FROM tw WHERE wn = 7),
            seas AS (SELECT event_type, dow,
                            (CAST(sum(detr_x7) AS BIGINT) * 1000000) // (7 * count(*)) AS seas_e6
                     FROM comp GROUP BY 1, 2)
            SELECT comp.event_type, comp.day_no, comp.dow, comp.c,
                   (comp.trend_x7 * 1000000) // 7 AS trend_e6,
                   seas.seas_e6,
                   comp.c * 1000000 - (comp.trend_x7 * 1000000) // 7 - seas.seas_e6 AS resid_e6
            FROM comp JOIN seas ON comp.event_type = seas.event_type AND comp.dow = seas.dow
            ORDER BY comp.event_type, comp.day_no"""),
  )

  private val trafficAnomaly = DeclaredQuery(
    "traffic_anomaly",
    (s, d) => anomalyFrom(typeDayPinned(s, d)),
    Some("""WITH dc AS (SELECT event_type,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day_no,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            dd AS (SELECT event_type, day_no, (day_no + 4) % 7 AS dow, c FROM dc),
            base AS (SELECT event_type, dow, CAST(sum(c) AS BIGINT) AS sum_c,
                            CAST(count(*) AS BIGINT) AS n_days
                     FROM dd GROUP BY 1, 2)
            SELECT dd.event_type, dd.day_no, dd.dow, dd.c, base.n_days, base.sum_c,
                   (abs(dd.c * base.n_days - base.sum_c) * 1000000) // base.sum_c AS dev_ppm
            FROM dd JOIN base USING (event_type, dow)
            ORDER BY dev_ppm DESC, dd.event_type, dd.day_no LIMIT 10"""),
  )

  /** Inter-arrival burstiness per user — the bot/automation screen
    * beside `user_type_entropy` (a cron job fires like a metronome, a
    * human in bursts): the classic Goh–Barabási statistic restated
    * sqrt-free as B = (σ² − μ²)/(σ² + μ²) ∈ [−1, 1] over each user's
    * second-granularity event gaps — B → −1 periodic (bot-like), ≈ 0
    * Poisson, → +1 heavy-tailed bursts (human-like). Users bucket into
    * five named bands; the declared output is the band histogram a
    * traffic-quality report carries.
    *
    * Exactness: with gaps as integer seconds, σ²−μ² and σ²+μ² are
    * RATIONALS of the exact per-user sums (n, Σg, Σg²) — both engines
    * form the identical wide-tier integer numerator/denominator
    * (DECIMAL(38,0) ≡ HUGEINT; magnitude ≈ n⁴·E[g²] ≤ 10³⁸ up to ~6×10⁶
    * events/user at a 30-day window — the round-15 bounds discipline;
    * beyond that, gaps rescale to minutes) and divide once at display
    * through the shared floor text. A var = mean = 0 user (all gaps
    * sub-second) is pinned to −1000 (perfectly regular) in both
    * engines. One user-keyed window + one user-grain agg is the only
    * corpus-sized work; the band histogram is ≤ 5 rows.
    */
  /** The per-slice gap-moment grain that makes `gap_burstiness`
    * continuously maintainable (the round-15 follow-up shipped): per
    * (slice, user) — event count, the slice's first/last (us, event_id)
    * endpoints, and the WITHIN-slice gap moments (count, Σg, Σg² with
    * the wide-tier square sum). A slice boundary cuts exactly ONE gap
    * per user — `first_us(next) − last_us(prev)` — so [[mergeGapGrain]]
    * restores it from the endpoints and the merged moments equal the
    * full-series moments EXACTLY.
    *
    * PRECONDITION (documented, spec-pinned): slices must be
    * time-contiguous per user — each slice's per-user [first, last]
    * range must not interleave another slice's, which is what
    * event-time-ordered stream arrival gives. An id-parity split (the
    * additive-grain test pattern) violates it BY DESIGN: within-slice
    * "gaps" of an interleaved slice are not gaps of the full series and
    * no boundary term can repair Σg² — that is exactly why this grain
    * was batch-tier until the contiguous-slice form landed.
    */
  private[graft] def gapGrainParts(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev.withColumn("us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn(
        "g",
        expr("CASE WHEN prev_us IS NULL THEN NULL ELSE (us - prev_us) DIV 1000000 END"),
      )
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(struct(col("us"), col("event_id"))).as("first"),
        max(struct(col("us"), col("event_id"))).as("last"),
        count(col("g")).as("n_gaps"),
        // single-event slices have zero gaps: pin the empty sums to 0 so
        // the additive merge never nulls a user's totals
        coalesce(sum(col("g")), lit(0L)).as("sg"),
        coalesce(
          sum((col("g").cast("decimal(38,0)") * col("g")).cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)"),
        ).as("sgg"),
      )
      .select(
        col("user_id"),
        col("n_events"),
        col("first.us").as("first_us"),
        col("first.event_id").as("first_eid"),
        col("last.us").as("last_us"),
        col("n_gaps"),
        col("sg"),
        col("sgg"),
      )
  }

  /** Merge gap-grain parts into full-series per-user moments
    * (user_id, n, sg, sgg): order each user's parts by their first
    * endpoint (parts-per-user = slice count, bounded by batch count —
    * the window frame is state-sized, never event-sized), restore the
    * ONE boundary gap each slice cut, and sum. Associative over any
    * time-contiguous slicing; one part ≡ the batch per-user agg.
    */
  private[graft] def mergeGapGrain(parts: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("first_us"), col("first_eid"))
    parts
      .withColumn("prev_last_us", lag(col("last_us"), 1).over(w))
      .withColumn(
        "bg",
        expr("CASE WHEN prev_last_us IS NULL THEN NULL ELSE (first_us - prev_last_us) DIV 1000000 END"),
      )
      .groupBy("user_id")
      .agg(
        (sum(col("n_gaps")) + count(col("bg"))).as("n"),
        (sum(col("sg")) + coalesce(sum(col("bg")), lit(0L))).as("sg"),
        (sum(col("sgg")) + coalesce(
          sum((col("bg").cast("decimal(38,0)") * col("bg")).cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)"),
        )).cast("decimal(38,0)").as("sgg"),
      )
  }

  /** The burstiness statistic + band histogram over per-user moments
    * (user_id, n, sg, sgg) — shared verbatim by the declared batch
    * query and the continuous serve ([[graft.streaming.EventStream
    * .burstinessFromState]]), so the statistic cannot drift between
    * them.
    */
  private[graft] def burstinessTail(moments: DataFrame): DataFrame = {
      val perUser = moments
        .filter(col("n") >= 4)
        .withColumn(
          "num",
          expr("""CAST(n AS DECIMAL(38,0)) * n * (n * sgg - CAST(sg AS DECIMAL(38,0)) * sg)
                 |  - CAST(n AS DECIMAL(38,0)) * (n - 1) * CAST(sg AS DECIMAL(38,0)) * sg""".stripMargin),
        )
        .withColumn(
          "den",
          expr("""CAST(n AS DECIMAL(38,0)) * n * (n * sgg - CAST(sg AS DECIMAL(38,0)) * sg)
                 |  + CAST(n AS DECIMAL(38,0)) * (n - 1) * CAST(sg AS DECIMAL(38,0)) * sg""".stripMargin),
        )
        .withColumn(
          "b_e3",
          expr("""CASE WHEN den = 0 THEN CAST(-1000 AS BIGINT)
                 |     ELSE CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000.0 + 0.5)
                 |               AS BIGINT) END""".stripMargin),
        )
        .withColumn(
          "bucket",
          // LOUD overflow guard: past the documented ~6×10⁶-gaps/user
          // bound the DECIMAL(38,0) products overflow to NULL (non-ANSI
          // decimal semantics), which a bare CASE would silently file
          // under ELSE 'extreme' while DuckDB's HUGEINT errors. A NULL
          // b_e3 can ONLY mean overflow (den = 0 is already pinned to
          // −1000), so raise the same loud failure DuckDB gives.
          expr("""CASE WHEN b_e3 IS NULL
                 |       THEN raise_error('gap_burstiness: DECIMAL(38,0) overflow — rescale gaps (see SCALE.md bounds census)')
                 |     WHEN b_e3 < -600 THEN 'periodic'
                 |     WHEN b_e3 < -200 THEN 'regular'
                 |     WHEN b_e3 <= 200 THEN 'neutral'
                 |     WHEN b_e3 <= 600 THEN 'bursty'
                 |     ELSE 'extreme' END""".stripMargin),
        )
      perUser
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("n")).as("n_gaps"),
          min(col("b_e3")).as("min_b_e3"),
          max(col("b_e3")).as("max_b_e3"),
        )
        .orderBy("bucket")
  }

  private val gapBurstiness = DeclaredQuery(
    "gap_burstiness",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val gaps = events(s, d)
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .select(col("user_id"), expr("(us - prev_us) DIV 1000000").as("g"))
      burstinessTail(
        gaps
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n"),
            sum(col("g")).as("sg"),
            sum((col("g").cast("decimal(38,0)") * col("g")).cast("decimal(38,0)")).as("sgg"),
          ),
      )
    },
    Some("""WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                      ORDER BY epoch_us(ts), event_id) AS prev_us
                       FROM events),
            gp AS (SELECT user_id, (us - prev_us) // 1000000 AS g
                   FROM x WHERE prev_us IS NOT NULL),
            pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(g) AS BIGINT) AS sg,
                          sum(CAST(g AS HUGEINT) * g) AS sgg
                   FROM gp GROUP BY 1 HAVING count(*) >= 4),
            bb AS (SELECT user_id, n,
                          CAST(n AS HUGEINT) * n * (n * sgg - CAST(sg AS HUGEINT) * sg)
                            - CAST(n AS HUGEINT) * (n - 1) * CAST(sg AS HUGEINT) * sg AS num,
                          CAST(n AS HUGEINT) * n * (n * sgg - CAST(sg AS HUGEINT) * sg)
                            + CAST(n AS HUGEINT) * (n - 1) * CAST(sg AS HUGEINT) * sg AS den
                   FROM pu),
            be AS (SELECT user_id, n,
                          CASE WHEN den = 0 THEN CAST(-1000 AS BIGINT)
                               ELSE CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                                               * 1000.0 + 0.5) AS BIGINT) END AS b_e3
                   FROM bb),
            bk AS (SELECT CASE WHEN b_e3 < -600 THEN 'periodic'
                               WHEN b_e3 < -200 THEN 'regular'
                               WHEN b_e3 <= 200 THEN 'neutral'
                               WHEN b_e3 <= 600 THEN 'bursty'
                               ELSE 'extreme' END AS bucket,
                          n, b_e3
                   FROM be)
            SELECT bucket, count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_gaps,
                   min(b_e3) AS min_b_e3, max(b_e3) AS max_b_e3
            FROM bk GROUP BY 1 ORDER BY 1"""),
  )

  /** PageRank over the event-type transition DIGRAPH — the declared
    * consumer of the directed recurrence in its STRUCTURE-SIZED form
    * ([[DedupOps.pagerankLocal]], bit-identical to the distributed
    * [[DedupOps.pagerank]] — PageRankSpec pins the equality): unlike
    * `fuzzy_pagerank`'s symmetric fast path, the transition graph has
    * real direction (signup → click, not back), so the dangling-mass
    * redistribution and the in-degree-0 coverage are exercised by the
    * gate, not only by PageRankSpec. A high-rank type is a journey SINK
    * — where user flows concentrate — the Markov-stationary reading of
    * `event_transitions`' row-normalized shares.
    *
    * Edges are the DISTINCT (prev → next) pairs off the same one
    * user-keyed window sort `event_transitions` uses; the graph is
    * |event types|²-bounded (structure-sized, never corpus-sized), so
    * the 5-round recurrence folds on the driver over dozens of rows —
    * the corpus-sized work is exactly one cached scan. Same exact ×10¹²
    * integer recurrence.
    */
  /** The DISTINCT (prev → next) event-type transition edge list off one
    * user-keyed window sort — |event types|²-bounded (structure-sized,
    * never corpus-sized), substrate-pinned so the corpus scan runs once
    * per (session, dataset). SINGLE definition for the "transition-edges"
    * cache key: both centrality queries (`transition_pagerank`,
    * `hits_scores`) consume it, so whichever runs first builds the same
    * frame (a drifted copy would silently let execution order pick the
    * substrate — the round-16 advice item).
    */
  private def transitionEdges(s: SparkSession, d: String): DataFrame =
    graft.SubstrateCache.substrate(s, d, "transition-edges") {
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("src"), col("event_type").as("dst"))
        .distinct()
        .coalesce(1) // |types|² rows: one partition kills ~20 32-task micro-stages
    }

  /** The transition edge list collected to the driver — the bounded
    * collect the centrality folds run on (|event types|² rows: dozens at
    * ANY corpus size; at 100× data only the cached scan inside
    * [[transitionEdges]] grows, never this result).
    */
  private def transitionEdgeList(s: SparkSession, d: String): Seq[(String, String)] =
    transitionEdges(s, d).collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  private val transitionPagerank = DeclaredQuery(
    "transition_pagerank",
    (s, d) => {
      import s.implicits._
      // The graph is structure-sized, so the 5-round recurrence runs as
      // a driver fold (DedupOps.pagerankLocal — bit-identical integer
      // arithmetic to the distributed engine, PageRankSpec-pinned): the
      // distributed loop's join+agg+left-join rounds over ≤ dozens of
      // rows were pure tiny-stage churn, 4.3 s of bench at sf0.1. The
      // corpus still never leaves the cluster — only the |types|² edge
      // list does.
      DedupOps
        .pagerankLocal(transitionEdgeList(s, d), DedupOps.PrIters)
        .toDF("node", "r")
        .orderBy("node")
    }, {
      val scale = DedupOps.PrScale
      val base = s"(15 * $scale) // (100 * (SELECT n FROM nn))"
      val steps = (1 to DedupOps.PrIters)
        .map { i =>
          s"""dg$i AS MATERIALIZED (SELECT CAST((SELECT coalesce(sum(r), 0) FROM pr${i - 1}
             |                      WHERE node NOT IN (SELECT src FROM sources))
             |                     // (SELECT n FROM nn) AS BIGINT) AS dshare),
             |pr$i AS MATERIALIZED (SELECT nodes.node,
             |               CAST($base + (85 * (coalesce(s.sc, 0) + (SELECT dshare FROM dg$i))) // 100 AS BIGINT) AS r
             |        FROM nodes LEFT JOIN (
             |          SELECT t.dst AS node, CAST(sum(pr${i - 1}.r // deg.deg) AS BIGINT) AS sc
             |          FROM t JOIN pr${i - 1} ON t.src = pr${i - 1}.node
             |                 JOIN deg ON deg.src = t.src
             |          GROUP BY t.dst) s USING (node))""".stripMargin
        }
        .mkString(",\n")
      Some(s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
               x AS (SELECT user_id, event_type,
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev
                     FROM ev),
               t AS MATERIALIZED (SELECT DISTINCT prev AS src, event_type AS dst FROM x WHERE prev IS NOT NULL),
               nodes AS MATERIALIZED (SELECT src AS node FROM t UNION SELECT dst FROM t),
               nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
               sources AS MATERIALIZED (SELECT DISTINCT src FROM t),
               deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM t GROUP BY 1),
               pr0 AS (SELECT node, CAST($scale // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes),
               $steps
               SELECT node, r FROM pr${DedupOps.PrIters} ORDER BY node""")
    },
  )

  /** Kaplan–Meier conversion curve (Kaplan & Meier 1958) — the survival
    * estimator behind "how fast do users convert": time from each
    * user's FIRST event (their epoch-day grain entry) to their FIRST
    * `purchase`, right-censored at the [[KmHorizonDays]]-day horizon
    * (the administrative-censoring form of a product's conversion-window
    * question; a user whose first purchase falls past the horizon stays
    * in the risk set until it and exits unconverted). S(t) steps only at
    * death times: S ← S·(n_risk − d) DIV n_risk as ×10⁶ truncating
    * integers — the SAME sequential fold on the driver and in the
    * oracle's recursive CTE, so the curve hash-matches bit-for-bit.
    *
    * Scale: the per-user (first-day, first-purchase-day) reduction is
    * one map-side-combined groupBy of the events scan (conditional min —
    * no second scan for the purchase arm); everything after lives on the
    * ≤ horizon+1-row day grain, and the fold itself is a bounded driver
    * loop of that length (the zipf-OLS/Lloyd-partials bounded-collect
    * class). Epoch-day via integer µs division — post-epoch fixture
    * precondition, documented at the type-day grain.
    */
  private val KmHorizonDays = 3L

  /** Per-user conversion grain `(user_id, fd, pd)` — first event day and
    * first purchase day, BOTH conditional MINs, so per-slice grains
    * merge exactly by (min fd, min pd): min over a union of slices =
    * min of slice minima (null pd = "no purchase in this slice",
    * ignored by min). The streaming twin
    * ([[graft.streaming.EventStream.startKmGrain]]) lands exactly this
    * frame per micro-batch.
    */
  private[graft] def kmUserGrain(ev: DataFrame): DataFrame =
    ev.select(
        col("user_id"),
        // FLOOR epoch-day (pmod then exact DIV) — the same spelling as
        // the shared type-day grain, so a pre-1970 timestamp lands on
        // its calendar day here too (bare DIV truncates toward zero)
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) DIV 86400000000").as("day"),
        col("event_type"),
      )
      .groupBy("user_id")
      .agg(
        min(col("day")).as("fd"),
        min(when(col("event_type") === "purchase", col("day"))).as("pd"),
      )

  /** The batch-query form of [[kmUserGrain]], substrate-pinned
    * (optimization round 17): both survival estimators (`kaplan_meier`,
    * `nelson_aalen`) share the one corpus-sized grain aggregation; the
    * streaming store keeps applying the per-batch form, unpinned.
    */
  private def kmGrainPinned(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.SubstrateCache.substrate(s, d, "km-user-grain")(kmUserGrain(events(s, d)))

  /** The KM curve from a merged `(user_id, fd, pd)` grain — the SHARED
    * post-grain pipeline of the declared batch query and the streaming
    * serve, so the estimator cannot drift between the two paths.
    */
  /** The (death-day, d, n_risk) risk table off the survival user grain
    * — SINGLE definition consumed by both survival estimators
    * (`kaplan_meier`'s product and `nelson_aalen`'s cumulative-hazard
    * sum), so the risk-set/censoring semantics cannot drift between
    * them. Grain-bounded end-to-end: ≤ horizon+1 rows.
    */
  private[graft] def kmRiskTable(grain: DataFrame): DataFrame = {
    val H = KmHorizonDays
    val perUser = grain.select(
      when(col("pd").isNotNull && col("pd") - col("fd") <= H, col("pd") - col("fd"))
        .otherwise(lit(H))
        .as("obs"),
      (col("pd").isNotNull && col("pd") - col("fd") <= H).as("ev"),
    )
    val dayGrain = perUser
      .groupBy("obs")
      .agg(
        sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("c"),
      )
    // n_risk(t) = users with obs >= t: a suffix sum over the
    // <= horizon+1-row day grain (grain-bounded window)
    dayGrain
      .withColumn(
        "n_risk",
        sum(col("c")).over(Window.orderBy("obs").rowsBetween(0, Window.unboundedFollowing)),
      )
      .filter(col("d") > 0L)
      .select(col("obs").as("t"), col("n_risk"), col("d"))
  }

  private[graft] def kaplanMeierFrom(grain: DataFrame): DataFrame = {
    val sp = grain.sparkSession
    import sp.implicits._
    val curve = kmRiskTable(grain)
      .orderBy("t")
      .collect() // bounded: <= horizon+1 death times
    var sE6 = 1000000L
    val rows = curve.map { r =>
      val (t, nRisk, dd) = (r.getLong(0), r.getLong(1), r.getLong(2))
      sE6 = sE6 * (nRisk - dd) / nRisk
      (t, nRisk, dd, sE6)
    }.toSeq
    rows.toDF("t", "n_risk", "n_events", "surv_e6").orderBy("t")
  }

  /** Nelson–Aalen cumulative hazard over the SAME risk table — the
    * additive survival estimator beside `kaplan_meier`'s product: each
    * death day contributes d/n_risk to H(t), so unlike the KM product
    * the whole curve stays DECLARATIVE (one ×10⁶ DIV per term, one
    * grain-bounded running sum — no driver fold, no recursion in the
    * oracle). H ≈ −ln S on the same data; reliability stacks read the
    * hazard increments directly.
    */
  private[graft] def nelsonAalenFrom(grain: DataFrame): DataFrame =
    kmRiskTable(grain)
      .withColumn("h_term_e6", expr("(d * 1000000) DIV n_risk"))
      .withColumn(
        "cumhaz_e6",
        sum(col("h_term_e6")).over(
          Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow),
        ),
      )
      .select(col("t"), col("n_risk"), col("d").as("n_events"), col("cumhaz_e6"))
      .orderBy("t")

  private val kaplanMeier = DeclaredQuery(
    "kaplan_meier",
    (s, d) => kaplanMeierFrom(kmGrainPinned(s, d)),
    Some(s"""WITH RECURSIVE ev AS (SELECT user_id,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
                               event_type FROM events),
             u AS (SELECT user_id, min(day) AS fd,
                          min(CASE WHEN event_type = 'purchase' THEN day END) AS pd
                   FROM ev GROUP BY 1),
             du AS (SELECT CASE WHEN pd IS NOT NULL AND pd - fd <= $KmHorizonDays
                                THEN pd - fd ELSE $KmHorizonDays END AS obs,
                           (pd IS NOT NULL AND pd - fd <= $KmHorizonDays) AS ev2
                    FROM u),
             g AS (SELECT obs, CAST(sum(CASE WHEN ev2 THEN 1 ELSE 0 END) AS BIGINT) AS d,
                          CAST(count(*) AS BIGINT) AS c
                   FROM du GROUP BY 1),
             r AS (SELECT g.obs AS t, g.d,
                          (SELECT CAST(sum(c) AS BIGINT) FROM g g2 WHERE g2.obs >= g.obs) AS n_risk
                   FROM g WHERE g.d > 0),
             o AS (SELECT t, d, n_risk, row_number() OVER (ORDER BY t) AS rn FROM r),
             km AS (SELECT rn, t, n_risk, d,
                           CAST(1000000 * (n_risk - d) // n_risk AS BIGINT) AS s
                    FROM o WHERE rn = 1
                    UNION ALL
                    SELECT o.rn, o.t, o.n_risk, o.d,
                           CAST(km.s * (o.n_risk - o.d) // o.n_risk AS BIGINT)
                    FROM km JOIN o ON o.rn = km.rn + 1)
             SELECT t, n_risk, d AS n_events, s AS surv_e6 FROM km ORDER BY t"""),
  )

  private val nelsonAalen = DeclaredQuery(
    "nelson_aalen",
    (s, d) => nelsonAalenFrom(kmGrainPinned(s, d)),
    Some(s"""WITH ev AS (SELECT user_id,
                               (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
                               event_type FROM events),
             u AS (SELECT user_id, min(day) AS fd,
                          min(CASE WHEN event_type = 'purchase' THEN day END) AS pd
                   FROM ev GROUP BY 1),
             du AS (SELECT CASE WHEN pd IS NOT NULL AND pd - fd <= $KmHorizonDays
                                THEN pd - fd ELSE $KmHorizonDays END AS obs,
                           (pd IS NOT NULL AND pd - fd <= $KmHorizonDays) AS ev2
                    FROM u),
             g AS (SELECT obs, CAST(sum(CASE WHEN ev2 THEN 1 ELSE 0 END) AS BIGINT) AS d,
                          CAST(count(*) AS BIGINT) AS c
                   FROM du GROUP BY 1),
             r AS (SELECT g.obs AS t, g.d,
                          (SELECT CAST(sum(c) AS BIGINT) FROM g g2 WHERE g2.obs >= g.obs) AS n_risk
                   FROM g WHERE g.d > 0)
             SELECT t, n_risk, d AS n_events,
                    CAST(sum((d * 1000000) // n_risk)
                         OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_e6
             FROM r ORDER BY t"""),
  )

  /** Association rules over sessions (Agrawal & Srikant 1994, the
    * 2-itemset tier of market-basket mining): for every ordered pair of
    * event types co-occurring in a session, support / confidence / lift
    * — "users who err also purchase?" is a lift read. Baskets are the
    * SHARED gap-based sessions ([[sessionAssigned]] — the same gap
    * semantics as `sessionize`), items are the session's DISTINCT types.
    *
    * Exactness: all three metrics are truncating integer quotients of
    * exact counts; lift's cross product n_ab·n_sessions crosses 2⁶³
    * once sessions pass ~3×10⁹ (a 100 TB stream does), so it rides a
    * DECIMAL(38,0) accumulator with BIGINT out (the magnitude-census
    * discipline, applied at birth).
    *
    * Scale: the distinct (session, item) frame is one groupBy off the
    * session assignment; the pair join fans each session's ≤ |types|
    * items into ≤ |types|² pairs (structure-bounded per session, never
    * quadratic in events); item totals are a |types|-row broadcast and
    * the session count one scalar row. The only corpus-sized exchange
    * is the user-keyed sort the whole temporal family shares.
    */
  private val assocRules = DeclaredQuery(
    "assoc_rules",
    (s, d) => {
      // Single-pass item-set shape (optimization round 17, guide §2.4):
      // ONE groupBy collapses each session to its sorted distinct item
      // array (collect_set dedupes — the former separate `.distinct()`
      // exchange is folded into the same shuffle), then session count,
      // item totals, and the pair census all explode the materialized
      // array leaf — the previous shape paid the (user, sess) exchange
      // four times (distinct + self-join both sides + totals) per run.
      // Pair semantics unchanged: x < y over a session's distinct items
      // ≡ the old distinct self-join (oracle unchanged, hash-identical).
      val items = sessionAssigned(s, d)
        .groupBy("user_id", "sess")
        .agg(sort_array(collect_set(col("event_type"))).as("items"))
        .select("items")
      val tot = items.agg(count(lit(1)).as("n"))
      val ia = items
        .select(explode(col("items")).as("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_i"))
      val pp = items
        .select(
          explode(
            expr(
              "flatten(transform(items, (x, i) -> " +
                "transform(slice(items, i + 2, size(items)), y -> named_struct('x', x, 'y', y))))",
            ),
          ).as("p"),
        )
        .select(col("p.x").as("x"), col("p.y").as("y"))
        .groupBy("x", "y")
        .agg(count(lit(1)).as("n_ab"))
      val rules = pp
        .select(col("x").as("ante"), col("y").as("cons"), col("n_ab"))
        .unionByName(pp.select(col("y").as("ante"), col("x").as("cons"), col("n_ab")))
      rules
        .join(broadcast(ia.select(col("event_type").as("ante"), col("n_i").as("n_a"))), Seq("ante"))
        .join(broadcast(ia.select(col("event_type").as("cons"), col("n_i").as("n_b"))), Seq("cons"))
        .crossJoin(broadcast(tot))
        .select(
          col("ante"),
          col("cons"),
          col("n_ab"),
          expr("n_ab * 1000000 DIV n").as("supp_e6"),
          expr("n_ab * 1000000 DIV n_a").as("conf_e6"),
          expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * n * 1000) DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
            .as("lift_e3"),
        )
        .orderBy("ante", "cons")
    },
    Some(s"""WITH $sessionDuckCtes,
             si AS (SELECT DISTINCT user_id, sess, event_type FROM z),
             ns AS (SELECT CAST(count(*) AS BIGINT) AS n
                    FROM (SELECT DISTINCT user_id, sess FROM si)),
             ia AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_i FROM si GROUP BY 1),
             pp AS (SELECT a.event_type AS x, b.event_type AS y, CAST(count(*) AS BIGINT) AS n_ab
                    FROM si a JOIN si b
                      ON a.user_id = b.user_id AND a.sess = b.sess AND a.event_type < b.event_type
                    GROUP BY 1, 2),
             rules AS (SELECT x AS ante, y AS cons, n_ab FROM pp
                       UNION ALL SELECT y, x, n_ab FROM pp)
             SELECT r.ante, r.cons, r.n_ab,
                    r.n_ab * 1000000 // ns.n AS supp_e6,
                    r.n_ab * 1000000 // a.n_i AS conf_e6,
                    CAST((CAST(r.n_ab AS HUGEINT) * ns.n * 1000)
                         // (CAST(a.n_i AS HUGEINT) * b.n_i) AS BIGINT) AS lift_e3
             FROM rules r
             JOIN ia a ON r.ante = a.event_type
             JOIN ia b ON r.cons = b.event_type
             CROSS JOIN ns
             ORDER BY r.ante, r.cons"""),
  )

  /** HITS hubs/authorities (Kleinberg 1999) over the same event-type
    * transition digraph as `transition_pagerank` — the third classical
    * centrality beside symmetric and directed PageRank: an AUTHORITY is
    * a type many hubby types flow INTO, a HUB one that feeds many
    * authoritative types; on a journey graph they separate sinks from
    * routers, which one stationary PageRank score cannot.
    *
    * Integer determinism: each of the [[HitsIters]] rounds is the exact
    * update a ← Σ_in h, h ← Σ_out a with an L1 renormalization to ×10⁶
    * (value·10⁶ DIV Σ — truncating in both engines); every intermediate
    * is ≤ |types|·10⁶, so nothing approaches 2⁶³ at any corpus size
    * (the graph is structure-bounded). Nodes with no in-edges (pure
    * sources) keep authority 0 — the same coverage discipline as the
    * directed PageRank.
    */
  private val HitsIters = 5

  /** The HITS recurrence as a driver fold over the bounded edge list —
    * the same exact-integer half-rounds the distributed loop ran
    * (a ← Σ_in h then ×10⁶ DIV Σa renorm; h ← Σ_out a then renorm; pure
    * sources keep authority 0 via getOrElse): non-negative Longs, Scala
    * `/` ≡ Spark DIV, order-invariant integer sums — bit-identical by
    * construction (the unrolled-CTE oracle is the independent pin). The
    * distributed form paid 10 half-rounds of tiny-stage churn (1.8 s at
    * sf0.1) over a |types|-row frame.
    */
  private[graft] def hitsLocal(
      edges: Seq[(String, String)],
      iters: Int,
  ): Seq[(String, Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val byDst = edges.groupBy(_._2)
    val bySrc = edges.groupBy(_._1)
    def renorm(m: Map[String, Long]): Map[String, Long] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> v * 1000000L / tot }
    }
    var h = nodes.map(_ -> 1000000L).toMap
    var a = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      a = renorm(nodes.map { v =>
        v -> byDst.get(v).map(_.map(e => h(e._1)).sum).getOrElse(0L)
      }.toMap)
      h = renorm(nodes.map { v =>
        v -> bySrc.get(v).map(_.map(e => a(e._2)).sum).getOrElse(0L)
      }.toMap)
    }
    nodes.map(v => (v, h(v), a(v)))
  }

  private val hitsScores = DeclaredQuery(
    "hits_scores",
    (s, d) => {
      import s.implicits._
      // shared substrate with transition_pagerank (one corpus scan per
      // session/dataset for the whole centrality family), then the
      // structure-sized driver fold — see transition_pagerank's note
      hitsLocal(transitionEdgeList(s, d), HitsIters)
        .toDF("node", "hub_e6", "auth_e6")
        .orderBy("node")
    }, {
      val steps = (1 to HitsIters)
        .map { i =>
          s"""ar$i AS MATERIALIZED (SELECT nodes.node, CAST(coalesce(s.a, 0) AS BIGINT) AS a
             |        FROM nodes LEFT JOIN (
             |          SELECT t.dst AS node, CAST(sum(h${i - 1}.h) AS BIGINT) AS a
             |          FROM t JOIN h${i - 1} ON t.src = h${i - 1}.node GROUP BY t.dst) s USING (node)),
             |a$i AS MATERIALIZED (SELECT node, a * 1000000 // (SELECT CAST(sum(a) AS BIGINT) FROM ar$i) AS a FROM ar$i),
             |hr$i AS MATERIALIZED (SELECT nodes.node, CAST(coalesce(s.h, 0) AS BIGINT) AS h
             |        FROM nodes LEFT JOIN (
             |          SELECT t.src AS node, CAST(sum(a$i.a) AS BIGINT) AS h
             |          FROM t JOIN a$i ON t.dst = a$i.node GROUP BY t.src) s USING (node)),
             |h$i AS MATERIALIZED (SELECT node, h * 1000000 // (SELECT CAST(sum(h) AS BIGINT) FROM hr$i) AS h FROM hr$i)""".stripMargin
        }
        .mkString(",\n")
      Some(s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
               x AS (SELECT user_id, event_type,
                            lag(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev
                     FROM ev),
               t AS MATERIALIZED (SELECT DISTINCT prev AS src, event_type AS dst FROM x WHERE prev IS NOT NULL),
               nodes AS MATERIALIZED (SELECT src AS node FROM t UNION SELECT dst FROM t),
               h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
               $steps
               SELECT nodes.node, h$HitsIters.h AS hub_e6, a$HitsIters.a AS auth_e6
               FROM nodes JOIN h$HitsIters USING (node) JOIN a$HitsIters USING (node)
               ORDER BY node""")
    },
  )

  val queries: Seq[DeclaredQuery] =
    Seq(asofJoin, sessionize, intervalJoinBinned, eventPairJoin, resampleFfill, funnelAbandon,
      retentionCohort, eventTransitions, eventDedupWindow, sessionStats, funnelConversion,
      eventTrigrams, wowGrowth, rollingActiveUsers, rollingActiveSketch, cumulativeUniqueSketch,
      scd2Intervals, freshnessAudit,
      dowSeasonality, funnelLatency, userTypeEntropy, cumulativeUniqueUsers,
      firstTouchAttribution, lastTouchAttribution, conversionWindowAttribution, gapBurstiness,
      trafficAnomaly, sessionFunnel, cusumChangepoint, expSmoothForecast, forecastBaselines,
      maseSes, holtForecast, seasonalForecast, transitionPagerank, kaplanMeier,
      assocRules, hitsScores, mannKendall, theilSen, acfLag7, transitionEntropy,
      pettittChangepoint, nelsonAalen, seasonalDecompose)
}
