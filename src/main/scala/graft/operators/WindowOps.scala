package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sequences, windows, ordering (SURVEY.md §2.5).
  *
  * The reference allocates contiguous UIDs/GIDs with a mutable counter
  * consumed in iteration order (identities.py:75-89) and burns colliding ids
  * in encounter order (identities.py:126-139, 233-254). Set-oriented
  * re-expression: rank the demand, rank the free-id pool, join on rank.
  *
  * Scale note: the global-order `row_number` windows here are single-
  * partition by construction (an ID allocator is inherently a global
  * sequence). At 100 TB you'd allocate per-shard ranges instead —
  * `row_number` within a partition key plus a per-shard base offset —
  * which is the same plan with `Window.partitionBy(shard)`.
  */
object WindowOps extends QueryModule {

  /** W1 — monotonic contiguous ID allocation (identities.py:75-89):
    * `start + rank` in a pinned order, NOT monotonically_increasing_id
    * (non-contiguous across partitions).
    */
  private val idAllocation = DeclaredQuery(
    "id_allocation",
    (s, d) => {
      val w = Window.orderBy("s_name")
      supplier(s, d)
        .select(col("s_name"))
        .withColumn("uid", (row_number().over(w) + 1024).cast("long"))
        .orderBy("s_name")
    },
    Some("""SELECT s_name, CAST(1024 + row_number() OVER (ORDER BY s_name) AS BIGINT) AS uid
            FROM supplier ORDER BY s_name"""),
  )

  /** W2 — collision skip-and-retry (identities.py:126-139): generate the
    * candidate pool, anti-join ids already taken, re-rank the survivors,
    * and join rank-to-rank against the ranked demand. Equivalent to the
    * reference's while-loop "burn and continue" because both consume free
    * ids in ascending order.
    */
  private val collisionAvoidAlloc = DeclaredQuery(
    "collision_avoid_alloc",
    (s, d) => {
      val p = part(s, d)
      val sup = supplier(s, d)
      // Pool upper bound: enough ids even if every taken id collides.
      val hi = p
        .agg(count(lit(1)).as("np"))
        .crossJoin(sup.agg(count(lit(1)).as("ns")))
        .select((lit(1024L) + col("np") + col("ns")).as("hi"))
      val candidates = hi.select(explode(sequence(lit(1025L), col("hi"))).as("id"))
      val taken = sup.select((col("s_suppkey") + 1024L).as("id"))
      val free = candidates
        .join(taken, Seq("id"), "left_anti")
        .withColumn("rn", row_number().over(Window.orderBy("id")))
      val demand = p
        .select(col("p_partkey"))
        .withColumn("rn", row_number().over(Window.orderBy("p_partkey")))
      demand
        .join(free, Seq("rn"))
        .select(col("p_partkey"), col("id").as("alloc_id"))
        .orderBy("p_partkey")
    },
    Some("""WITH cnt AS (SELECT CAST(1024 + (SELECT count(*) FROM part)
                              + (SELECT count(*) FROM supplier) AS BIGINT) AS hi),
                 cand AS (SELECT unnest(generate_series(1025, hi)) AS id FROM cnt),
                 taken AS (SELECT s_suppkey + 1024 AS id FROM supplier),
                 free AS (SELECT id, row_number() OVER (ORDER BY id) AS rn
                          FROM cand WHERE id NOT IN (SELECT id FROM taken)),
                 demand AS (SELECT p_partkey, row_number() OVER (ORDER BY p_partkey) AS rn
                            FROM part)
            SELECT p_partkey, free.id AS alloc_id
            FROM demand JOIN free USING (rn) ORDER BY p_partkey"""),
  )

  /** W3 — phase-ordered union (identities.py:284-309): tagged union whose
    * order is data (phase, key), never Dataset order.
    */
  private val phaseOrderUnion = DeclaredQuery(
    "phase_order_union",
    (s, d) => {
      val r = region(s, d).select(
        lit(1).as("phase"),
        col("r_regionkey").as("key"),
        col("r_name").as("name"),
      )
      val n = nation(s, d).select(
        lit(2).as("phase"),
        col("n_nationkey").as("key"),
        col("n_name").as("name"),
      )
      r.unionByName(n).orderBy("phase", "key")
    },
    Some("""SELECT 1 AS phase, r_regionkey AS key, r_name AS name FROM region
            UNION ALL
            SELECT 2 AS phase, n_nationkey AS key, n_name AS name FROM nation
            ORDER BY phase, key"""),
  )

  /** W4 — running counter (identities.py:79-81): cumulative sum in pinned
    * order, partitioned by order key so the window parallelizes per group.
    * (l_orderkey, l_linenumber) is NOT unique in the testdata, so the sort
    * key is widened to a full deterministic tiebreak; residual ties carry
    * identical quantities, keeping the cumulative sequence well-defined.
    */
  private val runningTotal = DeclaredQuery(
    "running_total",
    (s, d) => {
      val w = Window
        .partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .orderBy(
          "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
                   sum(l_quantity) OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity"""),
  )

  /** Gaps-and-islands over an id sequence — the classic run detector
    * (missing-invoice audits, retention streaks, free-range discovery
    * for the W2 allocator family): islands of consecutive click
    * event_ids via the id − row_number() constant-per-run trick, top-20
    * by (length desc, start). The filter to one type is what PUNCHES
    * the gaps — a dense unique id column has exactly one island.
    *
    * Declared at DAY grain (`islands within each day`), which is what
    * makes it scale-honest: the window partitions by day, so at 100 TB
    * each day's sequence sorts inside its partition and no global
    * single-partition window exists (a cross-day island splits at
    * midnight BY DEFINITION of the declared semantics, not as an
    * approximation). The grain generalizes: any id-range sharding works
    * the same way.
    */
  private val idGapIslands = DeclaredQuery(
    "id_gap_islands",
    (s, d) => {
      val w = Window
        .partitionBy("day")
        .orderBy("event_id")
      events(s, d)
        .filter(col("event_type") === "click")
        .select(
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long")
            .as("day"),
          col("event_id"),
        )
        .withColumn("grp", col("event_id") - row_number().over(w))
        .groupBy("day", "grp")
        .agg(
          min("event_id").as("island_start"),
          max("event_id").as("island_end"),
          count(lit(1)).as("island_len"),
        )
        .select("day", "island_start", "island_end", "island_len")
        .orderBy(col("island_len").desc, col("day"), col("island_start"))
        .limit(20)
    },
    Some("""WITH c AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
                              event_id
                       FROM events WHERE event_type = 'click'),
            g AS (SELECT day, event_id,
                         event_id - row_number() OVER (PARTITION BY day ORDER BY event_id) AS grp
                  FROM c),
            isl AS (SELECT day, grp, min(event_id) AS island_start,
                           max(event_id) AS island_end, count(*) AS island_len
                    FROM g GROUP BY 1, 2)
            SELECT day, island_start, island_end, island_len
            FROM isl ORDER BY island_len DESC, day, island_start LIMIT 20"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(
    idAllocation,
    collisionAvoidAlloc,
    phaseOrderUnion,
    runningTotal,
    idGapIslands,
  )
}
