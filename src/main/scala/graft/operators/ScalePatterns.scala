package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
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
            s"CAST(floor(-$SketchM.0 * ln(1.0 - least(v, ${SketchM - 1}) / $SketchM.0) + 0.5) AS BIGINT)"),
        )
        .orderBy("event_type"),
    Some(s"""WITH b AS (SELECT event_type, user_id,
                               (user_id * 2654435761) % 2147483647 AS a FROM events),
             c AS (SELECT event_type, user_id,
                          ((xor(a, a >> 7) * 97381) % 2147483647) % $SketchM AS bkt FROM b)
             SELECT event_type,
                    count(DISTINCT bkt) AS v,
                    count(DISTINCT user_id) AS exact_distinct,
                    CAST(floor(-$SketchM.0 * ln(1.0 - least(count(DISTINCT bkt), ${SketchM - 1}) / $SketchM.0) + 0.5) AS BIGINT) AS est
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

  val queries: Seq[DeclaredQuery] =
    Seq(saltedAgg, distinctSketch, bucketedJoinAgg, partitionedScanPrune)
}
