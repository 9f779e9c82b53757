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

  val queries: Seq[DeclaredQuery] = Seq(saltedAgg)
}
