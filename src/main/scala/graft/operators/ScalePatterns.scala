package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout patterns for 100 TB joins (SURVEY.md §4, SCALE.md):
  * bucketing for shuffle-free co-located joins, salting for skewed keys.
  * Mostly library utilities (they change physical plans, not results);
  * ScalePatternsSpec asserts the plan and result properties. The salted
  * two-phase aggregation is ALSO a declared query (`salted_agg`) because
  * its result is oracle-comparable.
  */
object ScalePatterns extends QueryModule {

  /** Persist a table bucketed+sorted by the join key. Two tables bucketed
    * the same way join with ZERO exchanges — the classic pre-shuffle
    * trade: pay the shuffle once at write time, never at read time.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key (shuffle-free). */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Skew-safe equi-join: spread each hot key of `big` over `salts`
    * sub-partitions; replicate `small` once per salt. Correct for any
    * distribution (the salt is join-key-neutral); worth it only when a
    * key's row count ≫ a partition's budget. AQE's skew-join handles the
    * sort-merge case automatically — explicit salting is for the cases
    * AQE can't split (e.g. aggregations after the join keyed the same
    * way, or broadcast-ineligible hash joins).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Range-partitioned sorted write — the layout for 100 TB output that
    * downstream consumers range-scan (time-series, key-range serving):
    * `repartitionByRange` samples the key distribution so files get
    * EQUAL ROW COUNTS (not equal key ranges — skew lands evenly), and
    * the within-partition sort makes every file a non-overlapping sorted
    * run whose parquet min/max footer prunes range reads.
    * ScalePatternsSpec proves the non-overlap property from the data.
    */
  def writeSortedByRange(df: DataFrame, dir: String, key: String, files: Int): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(dir)

  /** Salted two-phase aggregation: when one group key is hot enough to
    * overflow a reducer, aggregate (key, salt) first — spreading the hot
    * key over `salts` reducers — then combine the partials. Counts and
    * DECIMAL sums re-associate exactly, so the result is identical to the
    * direct groupBy the oracle states; only the physical distribution
    * changes. (Spark's own partial aggregation handles most skew; the
    * explicit pattern is for high-cardinality-per-key aggregates like
    * collect_list where map-side combine can't shrink the hot key.)
    */
  private val saltedAgg = DeclaredQuery(
    "salted_agg",
    (s, d) => {
      val salted = graft.Tables
        .events(s, d)
        .withColumn("__salt", pmod(col("event_id"), lit(16L)))
        .groupBy("event_type", "__salt")
        .agg(
          count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,2)")).as("pv"),
        )
      salted
        .groupBy("event_type")
        .agg(
          sum(col("pn")).as("n"),
          sum(col("pv")).cast("double").as("total_value"),
        )
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY event_type ORDER BY event_type"""),
  )

  /** Cardinality estimation by LINEAR COUNTING (Whang et al.): hash each
    * key into an m-bucket space and estimate n ≈ −m·ln(1 − v/m) from the
    * count of OCCUPIED buckets v. Chosen over HLL because it is exactly
    * reproducible across engines: the bucket function is shared integer
    * arithmetic and v is an exact distinct count bounded by m — so the
    * estimate is the same double in Spark and DuckDB, unlike
    * `approx_count_distinct`/`approx_quantile` whose sketch internals
    * differ per engine and can never be oracle-compared.
    *
    * At 100 TB: the partial aggregation dedupes buckets map-side, so at
    * most m values per group reach the shuffle regardless of corpus
    * size — that bounded-state property is the whole point of a
    * cardinality sketch. The `exact_distinct` column exists to exhibit
    * the estimator's error on the fixture (≈2%) and is what production
    * would drop. The `least(v, m−1)` guard keeps the saturated case
    * (v = m, estimator undefined) finite identically in both engines.
    */
  private val SketchM = 8192L

  /** The bucket function must AVALANCHE: a bare multiplicative residue
    * is a low-discrepancy rotation (dense sequential ids collide FAR
    * less than uniformly-random balls — measured v = n exactly on the
    * fixture), which silently breaks the estimator's collision model.
    * The xor-shift between two multiplications is the standard
    * nonlinearity; all stages stay below 2⁶³ (DuckDB errors on BIGINT
    * overflow where Spark wraps). Spark `^`/`shiftright` ≡ DuckDB
    * `xor`/`>>` — different spellings, identical integer semantics.
    */
  private val distinctSketch = DeclaredQuery(
    "distinct_sketch",
    (s, d) =>
      graft.Tables
        .events(s, d)
        .withColumn("a", (col("user_id") * lit(2654435761L)) % lit(2147483647L))
        .withColumn("bkt", expr(s"(((a ^ shiftright(a, 7)) * 97381) % 2147483647) % $SketchM"))
        .groupBy("event_type")
        .agg(
          countDistinct(col("bkt")).as("v"),
          countDistinct(col("user_id")).as("exact_distinct"),
        )
        .withColumn(
          "est",
          expr(
            s"CAST(floor(-$SketchM.0 * ln(1.0 - CAST(least(v, ${SketchM - 1}) AS DOUBLE) / $SketchM.0) + 0.5) AS BIGINT)"),
        )
        .orderBy("event_type"),
    Some(s"""WITH b AS (SELECT event_type, user_id,
                               (user_id * 2654435761) % 2147483647 AS a FROM events),
             c AS (SELECT event_type, user_id,
                          ((xor(a, a >> 7) * 97381) % 2147483647) % $SketchM AS bkt FROM b)
             SELECT event_type,
                    count(DISTINCT bkt) AS v,
                    count(DISTINCT user_id) AS exact_distinct,
                    CAST(floor(-$SketchM.0 * ln(1.0 - CAST(least(count(DISTINCT bkt), ${SketchM - 1}) AS DOUBLE) / $SketchM.0) + 0.5) AS BIGINT) AS est
             FROM c GROUP BY 1 ORDER BY 1"""),
  )

  /** Buckets for the declared co-located join. 8 matches the testdata
    * scale; at 100 TB the same layout uses O(cluster cores) buckets —
    * the number is a layout property, never a correctness one.
    */
  private val JoinBuckets = 8

  // One bucket layout per dataset per SESSION: saveAsTable is
  // side-effecting, so the build is memoized exactly like Ivf's durable
  // cell layouts. Weak keys so a discarded session never pins its plans
  // on the heap, and a per-session token in the catalog table names so
  // two sessions sharing one catalog in a JVM can't overwrite each
  // other's external bucket tables.
  private val bucketLayouts =
    new java.util.WeakHashMap[
      org.apache.spark.sql.SparkSession,
      scala.collection.mutable.Map[String, (String, String)],
    ]
  private val sessionSeq = new java.util.concurrent.atomic.AtomicLong()
  private val sessionTokens =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]

  /** Write customer + orders bucketed and sorted by the shared key into
    * EXTERNAL tables under a temp location (one layout per dataset per
    * session). This is the pay-once side of the trade the declared query
    * cashes in: the shuffle happens here, at layout time, and every
    * subsequent join/aggregation on the key runs exchange-free.
    */
  private[operators] def bucketedPair(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): (String, String) =
    bucketLayouts.synchronized {
      val token = {
        val t = sessionTokens.get(s)
        if (t != null) t
        else {
          val t2 = "s" + sessionSeq.incrementAndGet()
          sessionTokens.put(s, t2)
          t2
        }
      }
      val perSession = {
        var m = bucketLayouts.get(s)
        if (m == null) {
          m = scala.collection.mutable.Map.empty[String, (String, String)]
          bucketLayouts.put(s, m)
        }
        m
      }
      perSession.getOrElseUpdate(
        d, {
          val tag = token + "_" + d.replaceAll("[^a-zA-Z0-9]", "_")
          val base = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
          Ivf.deleteRecursivelyOnExit(base)
          val ct = s"graft_bkt_customer_$tag"
          val ot = s"graft_bkt_orders_$tag"
          graft.Tables
            .customer(s, d)
            .select("c_custkey", "c_name")
            .write
            .mode(SaveMode.Overwrite)
            .option("path", s"$base/customer")
            .bucketBy(JoinBuckets, "c_custkey")
            .sortBy("c_custkey")
            .format("parquet")
            .saveAsTable(ct)
          graft.Tables
            .orders(s, d)
            .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
            .write
            .mode(SaveMode.Overwrite)
            .option("path", s"$base/orders")
            .bucketBy(JoinBuckets, "c_custkey")
            .sortBy("c_custkey")
            .format("parquet")
            .saveAsTable(ot)
          (ct, ot)
        },
      )
    }

  /** Declared co-located join over the durable bucket layout: customer ⋈
    * orders on the bucket key, then per-customer order counts and spend —
    * and because BOTH the join and the aggregation key on the bucket
    * column, the ENTIRE plan runs without a single hash-partitioning
    * exchange (PlanAssertionsSpec pins it; the only exchange left is the
    * presentation sort's range partitioning). The `merge` hint keeps the
    * plan on the sort-merge path at test scale, where the dimension side
    * would otherwise broadcast and hide the bucket story being asserted.
    * At 100 TB this is THE pattern for a fact table repeatedly joined on
    * one key: 600 s of shuffle per query becomes zero, paid once at
    * ingest. Results are layout-independent (the oracle reads the plain
    * parquet), which is the whole point: bucketing changes the physical
    * plan, never the answer.
    */
  private val bucketedJoinAgg = DeclaredQuery(
    "bucketed_join_agg",
    (s, d) => {
      val (ct, ot) = bucketedPair(s, d)
      s.table(ct)
        .hint("merge")
        .join(s.table(ot), Seq("c_custkey"))
        .groupBy("c_custkey")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spend"),
        )
        .orderBy("c_custkey")
    },
    Some("""SELECT c.c_custkey, count(*) AS n_orders,
                   CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY 1 ORDER BY 1"""),
  )

  // One date-partitioned layout per dataset per JVM, like bucketLayouts.
  private val dayLayouts =
    scala.collection.mutable.Map.empty[(org.apache.spark.sql.SparkSession, String), String]

  /** Write events into a `partitionBy(day)` directory tree — the #1
    * physical layout of every production fact table: one directory per
    * day, so a date-range predicate prunes at PLANNING time and untouched
    * days are never opened. The µs-truncated timestamp round-trips
    * losslessly through the layout, so queries over it are exactly
    * queries over the source table.
    */
  private[operators] def dayPartitionedEvents(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): String =
    dayLayouts.synchronized {
      dayLayouts.getOrElseUpdate(
        (s, d), {
          val dir = java.nio.file.Files.createTempDirectory("graft-events-byday").toString
          Ivf.deleteRecursivelyOnExit(dir)
          graft.Tables
            .events(s, d)
            .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
            .write
            .mode(SaveMode.Overwrite)
            .partitionBy("day")
            .parquet(dir)
          dir
        },
      )
    }

  /** Week-2 window over the 30-day synthetic stream. ISO date strings
    * compare lexicographically, so the pruning predicate is a plain
    * string range on the partition column.
    */
  private val PruneFrom = "2024-01-08"
  private val PruneTo = "2024-01-14"

  /** Declared pruned scan: per-type counts and value sums over one week
    * of the date-partitioned layout. The range predicate on the partition
    * column becomes `PartitionFilters` (PlanAssertionsSpec pins it): the
    * scan LISTS 7 of 30 directories and never opens the rest — at 100 TB
    * the difference between reading 23 TB and 0.5 TB for the same query.
    * The oracle reads the PLAIN parquet with the equivalent timestamp
    * range: layout changes the bytes touched, never the answer.
    */
  private val partitionedScanPrune = DeclaredQuery(
    "partitioned_scan_prune",
    (s, d) =>
      s.read
        .parquet(dayPartitionedEvents(s, d))
        .filter(col("day") >= PruneFrom && col("day") <= PruneTo)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        )
        .orderBy("event_type"),
    Some(s"""SELECT event_type, count(*) AS n,
                    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             FROM events
             WHERE CAST(ts AS DATE) >= DATE '$PruneFrom'
               AND CAST(ts AS DATE) <= DATE '$PruneTo'
             GROUP BY 1 ORDER BY 1"""),
  )

  /** Bloom-filter semi-join reduction — the RUNTIME-FILTER pattern (what
    * `spark.sql.optimizer.runtime.bloomFilter` injects automatically for
    * shuffle joins, built explicitly so the mechanics are first-class and
    * the filter is reusable across queries): the selective dimension's
    * join keys compress into an m-bit Bloom filter that prefilters the
    * fact side BEFORE its shuffle; the exact join then removes the false
    * positives. At 100 TB the arithmetic is stark — a 16 Kbit filter
    * (2 KB broadcast) discards ~96% of a 100 TB fact scan at the scan,
    * so the join exchange moves 4 TB instead of 100 TB. Correctness is
    * unconditional: Blooms have no false negatives, and the residual
    * equi-join is exact, so the result is bit-identical to the plain
    * join the oracle states (the filter changes bytes shuffled, never
    * the answer — same contract as the layout patterns above).
    *
    * Engine-reproducible by construction: both hash chains are the
    * avalanche arithmetic of [[distinctSketch]] (exact BIGINT in both
    * engines), the bit array is 32-bit words (masks stay < 2³¹ — DuckDB
    * errors where Spark wraps on << overflow), and the word table
    * aggregates via bit_or. The probe is two ≤512-row broadcast joins +
    * a stateless mask test — scan-local, no fact shuffle until the
    * surviving 4%.
    */
  private val BloomBits = 16384L // m: 16 Kbit = 512 × 32-bit words
  private def bloomHash(col: String, mul1: Long, mul2: Long, shift: Int): String =
    s"((((($col * $mul1) % 2147483647) ^ shiftright((($col * $mul1) % 2147483647), $shift)) * $mul2) % 2147483647) % $BloomBits"

  private val bloomPruneJoin = DeclaredQuery(
    "bloom_prune_join",
    (s, d) => {
      val dimKeys = graft.Tables
        .customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000.0)
        .select("c_custkey")
      val h1 = bloomHash("c_custkey", 2654435761L, 97381L, 7)
      val h2 = bloomHash("c_custkey", 1103515245L, 69621L, 5)
      // one bit array holds both hash positions (the standard k=2 Bloom)
      val words = dimKeys
        .select(explode(array(expr(h1), expr(h2))).as("h"))
        .select(
          expr("CAST(h div 32 AS INT)").as("word"),
          expr("shiftleft(1, CAST(h % 32 AS INT))").as("m"),
        )
        .groupBy("word")
        .agg(expr("bit_or(m)").as("mask"))
      val g1 = bloomHash("o_custkey", 2654435761L, 97381L, 7)
      val g2 = bloomHash("o_custkey", 1103515245L, 69621L, 5)
      val probed = graft.Tables
        .orders(s, d)
        .withColumn("h1", expr(g1))
        .withColumn("h2", expr(g2))
        .join(broadcast(words.withColumnRenamed("mask", "m1")), expr("CAST(h1 div 32 AS INT) = word"))
        .filter(expr("(m1 & shiftleft(1, CAST(h1 % 32 AS INT))) != 0"))
        .drop("word", "m1")
        .join(broadcast(words.withColumnRenamed("mask", "m2")), expr("CAST(h2 div 32 AS INT) = word"))
        .filter(expr("(m2 & shiftleft(1, CAST(h2 % 32 AS INT))) != 0"))
        .drop("word", "m2")
      probed
        .join(dimKeys, col("o_custkey") === col("c_custkey")) // exact residual: kills false positives
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"),
        )
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
            FROM orders o
            JOIN (SELECT c_custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 8000.0) c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1 ORDER BY 1"""),
  )

  /** Salted JOIN as a declared query — the join-side twin of
    * [[saltedAgg]]: when one join key is hot enough that its rows
    * overflow a single reducer (a celebrity user, a null-heavy foreign
    * key), salting spreads the hot key's FACT rows over `SaltBuckets`
    * sub-partitions and replicates each DIMENSION row once per salt, so
    * the skewed key occupies `SaltBuckets` reducers instead of one. The
    * salt derives from `event_id` (pmod — deterministic, join-key-
    * neutral), so the joined row SET is exactly the plain join's; the
    * `merge` hint keeps the test-scale plan on the sort-merge path where
    * the (key, salt) exchange being demonstrated exists (AQE would
    * otherwise broadcast the small fixture dim and hide it). AQE's
    * skew-join splits sort-merge skew automatically at runtime; the
    * explicit pattern covers what it can't — pre-aggregations keyed the
    * same way, or plans where the skewed side must stay hash-partitioned
    * for a later stage.
    */
  private val SaltBuckets = 8L
  private val saltedJoin = DeclaredQuery(
    "salted_join",
    (s, d) => {
      val facts = graft.Tables
        .events(s, d)
        .withColumn("__salt", pmod(col("event_id"), lit(SaltBuckets)))
        .select(col("user_id"), col("__salt"), col("value"))
      val dim = graft.Tables
        .customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        .withColumn("__salt", explode(sequence(lit(0L), lit(SaltBuckets - 1))))
      facts
        .join(dim.hint("merge"), Seq("user_id", "__salt"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        )
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY 1 ORDER BY 1"""),
  )

  /** Sketch MERGEABILITY as a declared query — the property that makes
    * sketches a 100 TB primitive at all: the corpus-wide estimate is
    * computed from the per-type occupied-bucket sets (the sketches
    * themselves), never by re-touching the raw events. Production runs
    * this the other way around in time — per-day (or per-partition)
    * sketches are persisted at ingest, and ANY later rollup (per week,
    * per type, all-time) is a union of KB-sized bucket sets instead of a
    * rescan of the raw 100 TB — the re-aggregatable-cube property exact
    * distinct counts fundamentally lack (distinct counts don't add;
    * bucket sets union losslessly). The `(all)` row's v is
    * count(DISTINCT bkt) over the DEDUPED (type, bkt) sketch rows — at
    * most types × m rows regardless of corpus size. The exact_distinct
    * audit column is fixture-only, as in [[distinctSketch]]; the bucket
    * chain and estimator are shared with it verbatim.
    */
  private val sketchUnion = DeclaredQuery(
    "sketch_union",
    (s, d) => {
      val est = (v: org.apache.spark.sql.Column) =>
        expr(
          s"CAST(floor(-$SketchM.0 * ln(1.0 - CAST(least(v, ${SketchM - 1}) AS DOUBLE) / $SketchM.0) + 0.5) AS BIGINT)")
      val hashed = graft.Tables
        .events(s, d)
        .withColumn("a", (col("user_id") * lit(2654435761L)) % lit(2147483647L))
        .withColumn("bkt", expr(s"(((a ^ shiftright(a, 7)) * 97381) % 2147483647) % $SketchM"))
      // the per-type sketches: deduped occupied-bucket sets (≤ types × m rows)
      val sketches = hashed.select(col("event_type"), col("bkt")).distinct()
      val perType = sketches
        .groupBy("event_type")
        .agg(count(lit(1)).as("v"))
        .select(col("event_type").as("scope"), col("v"))
      val merged = sketches
        .agg(countDistinct(col("bkt")).as("v"))
        .select(lit("(all)").as("scope"), col("v"))
      val exact = hashed
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
        .select(col("event_type").as("scope"), col("exact_distinct"))
        .unionByName(
          hashed
            .agg(countDistinct(col("user_id")).as("exact_distinct"))
            .select(lit("(all)").as("scope"), col("exact_distinct")))
      perType
        .unionByName(merged)
        .withColumn("est", est(col("v")))
        .join(exact, Seq("scope"))
        .orderBy("scope")
    },
    Some(s"""WITH b AS (SELECT event_type, user_id,
                               (user_id * 2654435761) % 2147483647 AS a FROM events),
             c AS (SELECT event_type, user_id,
                          ((xor(a, a >> 7) * 97381) % 2147483647) % $SketchM AS bkt FROM b),
             sk AS (SELECT DISTINCT event_type, bkt FROM c),
             pt AS (SELECT event_type AS scope, count(*) AS v FROM sk GROUP BY 1
                    UNION ALL
                    SELECT '(all)' AS scope, count(DISTINCT bkt) AS v FROM sk),
             ex AS (SELECT event_type AS scope, count(DISTINCT user_id) AS exact_distinct
                    FROM c GROUP BY 1
                    UNION ALL
                    SELECT '(all)' AS scope, count(DISTINCT user_id) AS exact_distinct FROM c)
             SELECT pt.scope, pt.v,
                    CAST(floor(-$SketchM.0 * ln(1.0 - CAST(least(pt.v, ${SketchM - 1}) AS DOUBLE) / $SketchM.0) + 0.5) AS BIGINT) AS est,
                    ex.exact_distinct
             FROM pt JOIN ex ON pt.scope = ex.scope
             ORDER BY pt.scope"""),
  )

  /** Z-order (Morton) cell layout — MULTI-dimensional pruning, the
    * second axis `partitioned_scan_prune`'s 1-D day layout cannot give:
    * a fact table queried by 2-D boxes (user range × time range) lays
    * out by the bit-interleave of two clamped range buckets, so a box
    * predicate prunes to the PRODUCT of the per-dimension bucket sets —
    * cells outside either range are never listed. This is Delta/Iceberg
    * `ZORDER BY` at directory granularity; the same zval additionally
    * sorts within files so parquet row-group min/max stats prune both
    * dimensions inside each cell. Bucket functions are pure arithmetic
    * with a CLAMP at the top bucket (`least(x div W, 7)` — the
    * histogram-boundary move, corpus-size-independent: no wrap
    * aliasing, a box always maps to ≤ its own bucket span), so the
    * probe-side cell enumeration is driver arithmetic over the literal
    * box bounds — no data peeked, and the residual exact predicate
    * keeps the answer layout-independent (the oracle reads plain
    * parquet with the same box).
    */
  private val ZGridDayW = 4L // days per time bucket (30-day stream → 8 buckets)
  private val ZGridUserW = 16L // users per user bucket at fixture scale
  private val ZEpochDay = 19723L // 2024-01-01 as days since epoch

  private def zBits(bucket: String): String =
    s"(($bucket & 1) + 4 * (shiftright($bucket, 1) & 1) + 16 * (shiftright($bucket, 2) & 1))"

  /** zcell = interleave(userBucket, dayBucket), 3 bits each → 64 cells. */
  private def zcellExpr: org.apache.spark.sql.Column =
    expr(
      s"CAST(${zBits(s"least(user_id div $ZGridUserW, 7)")} + " +
        s"2 * ${zBits(s"least((datediff(CAST(ts AS DATE), DATE '1970-01-01') - $ZEpochDay) div $ZGridDayW, 7)")} AS INT)")

  private val zLayouts =
    scala.collection.mutable.Map.empty[(org.apache.spark.sql.SparkSession, String), String]

  private[operators] def zorderedEvents(
      s: org.apache.spark.sql.SparkSession,
      d: String,
  ): String =
    zLayouts.synchronized {
      zLayouts.getOrElseUpdate(
        (s, d), {
          val dir = java.nio.file.Files.createTempDirectory("graft-events-zorder").toString
          Ivf.deleteRecursivelyOnExit(dir)
          graft.Tables
            .events(s, d)
            .withColumn("zcell", zcellExpr)
            .sortWithinPartitions("zcell", "user_id", "ts") // row-group clustering inside cells
            .write
            .mode(SaveMode.Overwrite)
            .partitionBy("zcell")
            .parquet(dir)
          dir
        },
      )
    }

  /** The declared 2-D box: users [4, 35] × days [2024-01-09, 2024-01-16]
    * (bounds occupied at EVERY fixture scale — sf0.001 has only 15
    * users, so a higher box would AQE-collapse to an empty relation).
    */
  private val ZBoxULo = 4L
  private val ZBoxUHi = 35L
  private val ZBoxDLo = "2024-01-09"
  private val ZBoxDHi = "2024-01-16" // inclusive last day
  private val ZBoxDEnd = "2024-01-17" // exclusive end bound

  /** Driver-side z-range decomposition of the box: the image of the box
    * under the bucket functions — pure arithmetic on the literal bounds
    * (u-buckets 2..4 × d-buckets 2..3 → 6 of 64 cells).
    */
  private def zCellsOfBox: Seq[Int] = {
    val uB = (ZBoxULo / ZGridUserW).min(7) to (ZBoxUHi / ZGridUserW).min(7)
    val d0 = java.time.LocalDate.parse(ZBoxDLo).toEpochDay - ZEpochDay
    val d1 = java.time.LocalDate.parse(ZBoxDHi).toEpochDay - ZEpochDay
    val dB = (d0 / ZGridDayW).min(7) to (d1 / ZGridDayW).min(7)
    def spread(b: Long): Int =
      ((b & 1) + 4 * ((b >> 1) & 1) + 16 * ((b >> 2) & 1)).toInt
    (for { u <- uB; t <- dB } yield spread(u) + 2 * spread(t)).sorted
  }

  private val zorderScan = DeclaredQuery(
    "zorder_scan",
    (s, d) => {
      val cells: Seq[Any] = zCellsOfBox
      s.read
        .parquet(zorderedEvents(s, d))
        .filter(col("zcell").isin(cells: _*)) // literal isin → PartitionFilters
        .filter(
          col("user_id") >= ZBoxULo && col("user_id") <= ZBoxUHi &&
            col("ts") >= to_timestamp(lit(s"$ZBoxDLo 00:00:00")) &&
            col("ts") < to_timestamp(lit(s"$ZBoxDEnd 00:00:00")),
        )
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        )
        .orderBy("event_type")
    },
    Some(s"""SELECT event_type, count(*) AS n,
                    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             FROM events
             WHERE user_id BETWEEN $ZBoxULo AND $ZBoxUHi
               AND ts >= TIMESTAMP '$ZBoxDLo 00:00:00'
               AND ts < TIMESTAMP '$ZBoxDEnd 00:00:00'
             GROUP BY 1 ORDER BY 1"""),
  )

  /** Key-skew diagnostics — the measurement that DECIDES between the
    * plain, salted ([[saltedJoin]]/[[saltedAgg]]) and AQE-skew paths:
    * the top hot keys with their corpus share and their load ratio vs
    * the mean key (the number you compare against a reducer's budget).
    * One map-side-combined key count agg + a 1-row global + top-k —
    * key-cardinality exchange, TakeOrderedAndProject output, runs in a
    * planning pass long before the expensive join it protects. All
    * ratios are floor-scaled BIGINTs from exact counts (share in ppm,
    * load ratio ×1000) — engine- and partitioning-identical. At 100 TB
    * production samples the scan; the fixture counts exactly — same
    * plan, and the decision threshold ("hot key > K × mean") reads the
    * same columns either way.
    */
  private val skewDiagnostics = DeclaredQuery(
    "skew_diagnostics",
    (s, d) => {
      val counts = graft.Tables
        .events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val glob = counts.agg(
        sum("n").as("total"),
        count(lit(1)).as("n_keys"),
      )
      counts
        .crossJoin(broadcast(glob)) // 1-row corpus totals
        .withColumn(
          "share_ppm",
          expr("CAST(floor(CAST(n AS DOUBLE) * 1000000.0 / total + 0.5) AS BIGINT)"),
        )
        .withColumn(
          "load_x1000",
          expr("CAST(floor(CAST(n AS DOUBLE) * 1000.0 * n_keys / total + 0.5) AS BIGINT)"),
        )
        .select("user_id", "n", "share_ppm", "load_x1000")
        .orderBy(col("n").desc, col("user_id"))
        .limit(10)
    },
    Some("""WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
            g AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM c)
            SELECT user_id, n,
                   CAST(floor(CAST(n AS DOUBLE) * 1000000.0 / total + 0.5) AS BIGINT) AS share_ppm,
                   CAST(floor(CAST(n AS DOUBLE) * 1000.0 * n_keys / total + 0.5) AS BIGINT) AS load_x1000
            FROM c, g
            ORDER BY n DESC, user_id LIMIT 10"""),
  )

  /** Mergeable partial-aggregate state — the incremental-rollup pattern
    * every 100 TB pipeline needs for its daily/hourly batches: aggregate
    * each ingest slice to a compact per-key STATE (count, decimal sum,
    * min/max), then MERGE states across slices with the same associative
    * ops, and prove the merged result equals a from-scratch aggregation.
    * The `parity` column carries that proof into the declared output
    * (all-true), so a regression in mergeability fails the hash gate —
    * the same algebra that makes Spark's own partial aggregation and
    * `Aggregator.merge` correct, here exercised at the PIPELINE level
    * (state persisted between runs, merged next run).
    *
    * Plan: the slice split is a scan-local predicate (event-id parity
    * stands in for the ingest-day partition column); each arm is one
    * partial+final hash agg; the merge is a second agg over
    * 2×keys rows; the parity join is keys-cardinality, un-hinted (AQE).
    * Nothing here scales with row count past the first agg — exactly why
    * production rollups store states, not raw events.
    */
  private val aggStateMerge = DeclaredQuery(
    "agg_state_merge",
    (s, d) => {
      val ev = graft.Tables
        .events(s, d)
        .select(
          col("user_id"),
          pmod(col("event_id"), lit(2L)).as("slice"),
          col("value").cast("decimal(18,2)").as("v"),
          unix_micros(col("ts")).as("tus"),
        )
      // per-slice compact state: the thing a daily job would persist
      val states = ev
        .groupBy("user_id", "slice")
        .agg(
          count(lit(1)).as("pn"),
          sum("v").as("pv"),
          min("tus").as("pmin"),
          max("tus").as("pmax"),
        )
      // next-day merge: same associative ops over states, not events
      val merged = states
        .groupBy("user_id")
        .agg(
          sum("pn").as("n"),
          sum("pv").cast("decimal(18,2)").as("total"),
          min("pmin").as("first_us"),
          max("pmax").as("last_us"),
        )
      val direct = ev
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("dn"),
          sum("v").cast("decimal(18,2)").as("dtotal"),
          min("tus").as("dfirst"),
          max("tus").as("dlast"),
        )
      merged
        .join(direct, Seq("user_id")) // keys-cardinality both sides: AQE decides
        .select(
          col("user_id"),
          col("n"),
          col("total").cast("double").as("total_value"),
          col("first_us"),
          col("last_us"),
          (col("n") === col("dn") && col("total") === col("dtotal")
            && col("first_us") === col("dfirst") && col("last_us") === col("dlast"))
            .as("parity"),
        )
        .orderBy("user_id")
    },
    Some("""WITH ev AS (SELECT user_id, event_id % 2 AS slice,
                               CAST(value AS DECIMAL(18,2)) AS v,
                               epoch_us(ts) AS tus
                        FROM events),
            states AS (SELECT user_id, slice, count(*) AS pn, sum(v) AS pv,
                              min(tus) AS pmin, max(tus) AS pmax
                       FROM ev GROUP BY 1, 2),
            merged AS (SELECT user_id, CAST(sum(pn) AS BIGINT) AS n,
                              CAST(sum(pv) AS DECIMAL(18,2)) AS total,
                              min(pmin) AS first_us, max(pmax) AS last_us
                       FROM states GROUP BY 1),
            direct AS (SELECT user_id, count(*) AS dn,
                              CAST(sum(v) AS DECIMAL(18,2)) AS dtotal,
                              min(tus) AS dfirst, max(tus) AS dlast
                       FROM ev GROUP BY 1)
            SELECT m.user_id, n, CAST(total AS DOUBLE) AS total_value,
                   first_us, last_us,
                   (n = dn AND total = dtotal AND first_us = dfirst AND last_us = dlast)
                     AS parity
            FROM merged m JOIN direct d ON m.user_id = d.user_id
            ORDER BY m.user_id"""),
  )

  /** Join-size audit — the pre-flight cardinality measurement that
    * decides whether a join is safe to run at all (the third member of
    * the measure-before-you-plan family with `skew_diagnostics` and
    * `dedup_sweep_cost`): the EXACT output cardinality of orders ⋈
    * events on the customer key is Σ_k cntA(k)·cntB(k), computable from
    * two key-grain aggregates WITHOUT running the join. Also reports
    * each side's distinct keys, the matched-key count, and the top
    * single-key contribution — the number that says "this one key
    * produces half the output, salt it".
    *
    * Plan: two partial+final key aggs (key-cardinality rows), one
    * un-hinted key join of THOSE (never the fact tables), a 1-row
    * summary. At 100 TB this costs two shuffles of (key, count) pairs —
    * the cheap question to ask before a join that could emit 10¹³ rows.
    */
  private val joinSizeAudit = DeclaredQuery(
    "join_size_audit",
    (s, d) => {
      val a = graft.Tables
        .orders(s, d)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("ca"))
      val b = graft.Tables
        .events(s, d)
        .groupBy(col("user_id").as("k"))
        .agg(count(lit(1)).as("cb"))
      a.join(b, Seq("k")) // un-hinted: both sides key-cardinality
        .select(col("k"), (col("ca") * col("cb")).as("contrib"))
        .agg(
          count(lit(1)).as("matched_keys"),
          sum("contrib").as("join_rows"),
          max("contrib").as("max_key_rows"),
        )
        .crossJoin(
          broadcast(
            graft.Tables.orders(s, d).agg(countDistinct("o_custkey").as("keys_a")),
          ),
        ) // 1-row scalar
        .crossJoin(
          broadcast(graft.Tables.events(s, d).agg(countDistinct("user_id").as("keys_b"))),
        ) // 1-row scalar
        .select("matched_keys", "join_rows", "max_key_rows", "keys_a", "keys_b")
        .orderBy("matched_keys")
    },
    Some("""WITH a AS (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1),
            b AS (SELECT user_id AS k, count(*) AS cb FROM events GROUP BY 1),
            j AS (SELECT a.k, ca * cb AS contrib FROM a JOIN b ON a.k = b.k),
            t AS (SELECT count(*) AS matched_keys,
                         CAST(sum(contrib) AS BIGINT) AS join_rows,
                         CAST(max(contrib) AS BIGINT) AS max_key_rows
                  FROM j)
            SELECT matched_keys, join_rows, max_key_rows,
                   (SELECT count(DISTINCT o_custkey) FROM orders) AS keys_a,
                   (SELECT count(DISTINCT user_id) FROM events) AS keys_b
            FROM t ORDER BY matched_keys"""),
  )

  /** Order-independent table checksum — the anti-entropy primitive of
    * every 100 TB migration/replication audit (DynamoDB/Cassandra repair,
    * HDFS distcp -update verification): source and destination each
    * reduce a slice to (n, Σ rowhash mod M, XOR rowhash) per group and
    * compare the tiny summaries — no sort, no row transfer, no ordering
    * assumption. The two digests are complementary: XOR is carry-free
    * but blind to duplicated row PAIRS (x ⊕ x = 0); the modular sum
    * catches exactly those. The row hash is an explicit integer
    * polynomial over the columns (shared-formula discipline — both
    * engines state the same arithmetic; no engine-native hash()), with
    * money carried as exact cents.
    *
    * Plan: scan-local hash + ONE partial+final agg with constant state
    * per group — the cheapest possible full-table pass; map-side
    * partials mean the exchange carries groups × 3 longs. Row hashes are
    * < 2³¹, so the BIGINT Σ is exact to ~4×10⁹ rows per group; past
    * that, `wide = true` swaps ONLY the Σ accumulator to DECIMAL(38,0)
    * (headroom ~10³⁸ ≫ any corpus×hash product) — the
    * `embedding_covariance` knob pattern (SimilarityOps
    * .covarianceMoments), applied here because a 100 TB anti-entropy
    * digest over a hot group genuinely crosses the BIGINT bound. Under
    * ANSI the BIGINT tier fails loudly at the bound (Round12OpsSpec
    * proves both the loud failure and DECIMAL/BIGINT parity in range);
    * the XOR digest and the count are overflow-free either way (XOR is
    * fixed-width, counts cap at corpus rows).
    */
  private[graft] def tableChecksumFrame(
      s: SparkSession,
      d: String,
      wide: Boolean,
  ): DataFrame = {
    val rh = expr(
      """((o_orderkey * 2654435761 + o_custkey * 97381
        |   + CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) % 2147483647)""".stripMargin,
    )
    // Wide tier: DECIMAL(38,0) ACCUMULATOR, BIGINT declared output
    // ("BIGINT means out", round-15 finding) — ANSI fails the final cast
    // loudly past 2⁶³ instead of drifting the declared dtype; flip the
    // non-declared `wide` knob's output only if a consumer truly needs
    // the >2⁶³ digest.
    val acc =
      if (wide) sum(col("rh").cast("decimal(38,0)")).cast("long") else sum(col("rh"))
    graft.Tables
      .orders(s, d)
      .withColumn("rh", rh)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        acc.as("checksum_sum"),
        expr("bit_xor(rh)").as("checksum_xor"),
      )
      .orderBy("o_orderpriority")
  }

  /** The row-hash and partial-digest grain of [[eventsChecksum]] —
    * shared by the declared batch query and the streaming state store
    * ([[graft.streaming.EventStream.startChecksumState]]), so the
    * digest definition cannot drift between the two. Money rides as
    * exact cents; the polynomial is the shared-formula discipline
    * (both engines state the same integer arithmetic, no engine-native
    * hash()). Output: (event_type, pn, psum, pxor) — one partial row
    * per (input slice × feed), merged by [[mergeChecksumParts]].
    */
  private[graft] def eventsChecksumParts(ev: DataFrame): DataFrame =
    ev.withColumn(
      "rh",
      expr("""((event_id * 2654435761 + user_id * 97381
              |  + CAST(floor(value * 100.0 + 0.5) AS BIGINT)) % 2147483647)""".stripMargin),
    ).groupBy("event_type")
      .agg(
        count(lit(1)).as("pn"),
        // WIDE partial sums (round-15 census): rh < 2³¹ means a BIGINT Σ
        // crosses 2⁶³ at ~4.3×10⁹ rows per feed — a 100 TB hot feed
        // exceeds that. DECIMAL(38,0) partials merge exactly to 10²⁷
        // rows and land unchanged in the streaming state store.
        sum(col("rh").cast("decimal(38,0)")).as("psum"),
        expr("bit_xor(rh)").as("pxor"),
      )

  /** Merge partial digests — associative and commutative in every
    * component (count: +, modular-free exact sum: +, xor: ⊕), so ANY
    * slicing of the corpus into parts merges to the same digests: the
    * property that makes the checksum continuously maintainable
    * (streaming batch dirs), distributable (partial+final agg), and
    * comparable across replicas.
    */
  private[graft] def mergeChecksumParts(parts: DataFrame): DataFrame =
    parts
      .groupBy("event_type")
      .agg(
        sum("pn").as("n"),
        // Merge in the wide tier regardless of the partials' dtype
        // (fresh partials are DECIMAL(38,0); compacted state may have
        // round-tripped through the BIGINT report), then DECLARE the
        // merged digest as BIGINT ("BIGINT means out", round-15
        // finding) — ANSI fails the cast loudly past 2⁶³.
        sum(col("psum").cast("decimal(38,0)")).cast("long").as("checksum_sum"),
        expr("bit_xor(pxor)").as("checksum_xor"),
      )
      .orderBy("event_type")

  /** Anti-entropy digest of the EVENT STREAM per feed — the
    * `table_checksum` discipline pointed at the table that arrives
    * continuously, which is where the anti-entropy question is asked
    * in practice (did the replica ingest exactly what the source
    * emitted?). Declared as parts→merge so the batch query IS the
    * merge of one giant part — the identical code path the streaming
    * store serves through, parity-tested in StreamingSpec with
    * overlapping slices and an idempotent replay.
    *
    * Plan: scan-local hash, ONE partial+final agg pair (the parts agg
    * and the merge agg collapse — feed-cardinality intermediate), no
    * sort below the output ordering. Declared at the DECIMAL(38) wide
    * tier since the round-15 census: a BIGINT Σ is exact only to ~4×10⁹
    * rows per feed — a 100 TB hot feed exceeds that — while the wide
    * sum holds past 10²⁷ rows and merges identically.
    */
  private val eventsChecksum = DeclaredQuery(
    "events_checksum",
    (s, d) => mergeChecksumParts(eventsChecksumParts(graft.Tables.events(s, d))),
    Some("""WITH h AS (SELECT event_type,
                              ((event_id * 2654435761 + user_id * 97381
                                + CAST(floor(value * 100.0 + 0.5) AS BIGINT)) % 2147483647) AS rh
                       FROM events)
            SELECT event_type, count(*) AS n,
                   CAST(sum(rh) AS BIGINT) AS checksum_sum,
                   bit_xor(rh) AS checksum_xor
            FROM h GROUP BY 1 ORDER BY 1"""),
  )

  /** Declared at the WIDE tier since the round-15 magnitude census:
    * rh < 2³¹, so a BIGINT Σ crosses 2⁶³ at ~4.3×10⁹ rows per group —
    * a 100 TB hot priority exceeds that. DECIMAL(38,0) holds past 10²⁷
    * rows; the BIGINT tier stays available as `wide = false` (both
    * parity- and loud-overflow-tested in Round12OpsSpec).
    */
  private val tableChecksum = DeclaredQuery(
    "table_checksum",
    (s, d) => tableChecksumFrame(s, d, wide = true),
    Some("""WITH h AS (SELECT o_orderpriority,
                              ((o_orderkey * 2654435761 + o_custkey * 97381
                                + CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) % 2147483647) AS rh
                       FROM orders)
            SELECT o_orderpriority, count(*) AS n,
                   CAST(sum(rh) AS BIGINT) AS checksum_sum,
                   bit_xor(rh) AS checksum_xor
            FROM h GROUP BY 1 ORDER BY 1"""),
  )

  /** Pairwise audience-intersection estimates from the SAME
    * linear-counting bucket sketches `sketch_union` merges — the
    * inclusion–exclusion read (|A∩B| ≈ est(A) + est(B) − est(A∪B))
    * that answers "how much do these event audiences overlap" WITHOUT
    * ever joining user sets: sketches of every scope pair union in
    * bucket space (|S_A ∪ S_B| = v_A + v_B − |S_A ∩ S_B|, one
    * bucket-level join over ≤ types·m rows). The exact intersection
    * rides along per pair as the ground truth column, so the estimate's
    * error is part of the declared output (the `ann_recall`
    * measure-the-approximation discipline).
    *
    * Exactness: bucket sets are deterministic (shared hash spelling);
    * the three linear-counting estimates use the IDENTICAL est() text
    * as `sketch_union`; inclusion–exclusion on the three BIGINTs is
    * integer arithmetic (can go negative at high occupancy — reported
    * as-is, that IS the estimator).
    *
    * Scale: sketches are types × m bounded; the pair frame is
    * |types|²-bounded; the exact column's (type, user) self-join fans
    * each user by their type-degree (≤ |types|), never user².
    */
  private val sketchIntersect = DeclaredQuery(
    "sketch_intersect",
    (s, d) => {
      val est = (v: org.apache.spark.sql.Column) =>
        expr(
          s"CAST(floor(-$SketchM.0 * ln(1.0 - CAST(least(${v.toString}, ${SketchM - 1}) AS DOUBLE) / $SketchM.0) + 0.5) AS BIGINT)")
      val hashed = graft.Tables
        .events(s, d)
        .withColumn("a", (col("user_id") * lit(2654435761L)) % lit(2147483647L))
        .withColumn("bkt", expr(s"(((a ^ shiftright(a, 7)) * 97381) % 2147483647) % $SketchM"))
      val sketches = hashed.select(col("event_type"), col("bkt")).distinct()
      val perType = sketches.groupBy("event_type").agg(count(lit(1)).as("v"))
      val interB = sketches
        .select(col("event_type").as("ta"), col("bkt"))
        .join(sketches.select(col("event_type").as("tb"), col("bkt")), Seq("bkt"))
        .filter(col("ta") < col("tb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("vi"))
      val exactI = hashed
        .select(col("event_type"), col("user_id"))
        .distinct()
        .select(col("event_type").as("ta"), col("user_id"))
        .join(
          hashed.select(col("event_type").as("tb"), col("user_id")).distinct(),
          Seq("user_id"),
        )
        .filter(col("ta") < col("tb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("exact_intersect"))
      interB
        .join(broadcast(perType.select(col("event_type").as("ta"), col("v").as("va"))), Seq("ta"))
        .join(broadcast(perType.select(col("event_type").as("tb"), col("v").as("vb"))), Seq("tb"))
        .withColumn("vu", col("va") + col("vb") - col("vi"))
        .withColumn("est_a", est(col("va")))
        .withColumn("est_b", est(col("vb")))
        .withColumn("est_union", est(col("vu")))
        .withColumn("est_intersect", col("est_a") + col("est_b") - col("est_union"))
        .join(exactI, Seq("ta", "tb"))
        .select("ta", "tb", "est_a", "est_b", "est_union", "est_intersect", "exact_intersect")
        .orderBy("ta", "tb")
    },
    Some {
      def estSql(v: String) =
        s"CAST(floor(-$SketchM.0 * ln(1.0 - CAST(least($v, ${SketchM - 1}) AS DOUBLE) / $SketchM.0) + 0.5) AS BIGINT)"
      s"""WITH b AS (SELECT event_type, user_id,
                            (user_id * 2654435761) % 2147483647 AS a FROM events),
          c AS (SELECT event_type, user_id,
                       ((xor(a, a >> 7) * 97381) % 2147483647) % $SketchM AS bkt FROM b),
          sk AS (SELECT DISTINCT event_type, bkt FROM c),
          pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS v FROM sk GROUP BY 1),
          ib AS (SELECT x.event_type AS ta, y.event_type AS tb, CAST(count(*) AS BIGINT) AS vi
                 FROM sk x JOIN sk y ON x.bkt = y.bkt AND x.event_type < y.event_type
                 GROUP BY 1, 2),
          tu AS (SELECT DISTINCT event_type, user_id FROM c),
          ei AS (SELECT x.event_type AS ta, y.event_type AS tb,
                        CAST(count(*) AS BIGINT) AS exact_intersect
                 FROM tu x JOIN tu y ON x.user_id = y.user_id AND x.event_type < y.event_type
                 GROUP BY 1, 2),
          f AS (SELECT ib.ta, ib.tb, pa.v AS va, pb.v AS vb, pa.v + pb.v - ib.vi AS vu
                FROM ib JOIN pt pa ON ib.ta = pa.event_type
                        JOIN pt pb ON ib.tb = pb.event_type)
          SELECT f.ta, f.tb,
                 ${estSql("f.va")} AS est_a,
                 ${estSql("f.vb")} AS est_b,
                 ${estSql("f.vu")} AS est_union,
                 ${estSql("f.va")} + ${estSql("f.vb")} - ${estSql("f.vu")} AS est_intersect,
                 ei.exact_intersect
          FROM f JOIN ei ON f.ta = ei.ta AND f.tb = ei.tb
          ORDER BY f.ta, f.tb"""
    },
  )

  val queries: Seq[DeclaredQuery] =
    Seq(saltedAgg, distinctSketch, bucketedJoinAgg, partitionedScanPrune,
      bloomPruneJoin, saltedJoin, sketchUnion, zorderScan, skewDiagnostics,
      aggStateMerge, joinSizeAudit, tableChecksum, eventsChecksum, sketchIntersect)
}
