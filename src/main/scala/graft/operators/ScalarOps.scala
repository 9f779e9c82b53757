package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar transforms (SURVEY.md §2.2, §2.7): projections, predicates,
  * string/bit/date/JSON functions. Everything is a built-in Catalyst
  * expression — whole-stage-codegen'd, pushdown-friendly; no UDFs.
  */
object ScalarOps extends QueryModule {

  /** Mirrors _scripts.py:106-113: a user-supplied suffix gets a "-" prefix
    * iff it doesn't already start with one. Plan-time normalization.
    */
  def normalizeSuffix(suffix: String): String =
    if (suffix.isEmpty || suffix.startsWith("-")) suffix else s"-$suffix"

  /** P1/P2/F6 — structure-preserving suffix application
    * (identities.py:323-347): every name rewritten `name + suffix`.
    */
  private val suffixProjection = {
    val sfx = normalizeSuffix("cl1") // "-cl1"
    DeclaredQuery(
      "suffix_projection",
      (s, d) =>
        nation(s, d)
          .select(
            col("n_nationkey"),
            col("n_name"),
            concat(col("n_name"), lit(sfx)).as("suffixed"),
            concat(lower(col("n_name")), lit(sfx)).as("owner_suffixed"),
          )
          .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, n_name,
                     n_name || '-cl1' AS suffixed,
                     lower(n_name) || '-cl1' AS owner_suffixed
              FROM nation ORDER BY n_nationkey"""),
    )
  }

  /** P3/P4 — case-insensitive lookup (onefs.py:688-693 zone match). */
  private val ciLookup = DeclaredQuery(
    "ci_lookup",
    (s, d) =>
      region(s, d)
        .filter(lower(col("r_name")) === "europe")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey"),
    Some("""SELECT r_regionkey, r_name FROM region
            WHERE lower(r_name) = 'europe' ORDER BY r_regionkey"""),
  )

  /** P6/P7/F9/F10 — error-message classification (onefs.py:256-287 format
    * matchers; onefs.py:796-806 license IN-list + date predicate), as a
    * CASE-WHEN kind column + per-kind counts.
    */
  private val errorClassify = DeclaredQuery(
    "error_classify",
    (s, d) =>
      events(s, d)
        .withColumn(
          "kind",
          when(col("event_type").isin("error"), "failure")
            .when(col("event_type").isin("click", "view"), "engagement")
            .when(col("event_type").isin("purchase", "signup"), "conversion")
            .otherwise("other"),
        )
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("value") > 5.0, 1)).as("n_high"),
          count(when(col("ts") < to_timestamp(lit("2024-01-15 00:00:00")), 1))
            .as("n_early"),
        )
        .orderBy("kind"),
    Some("""SELECT CASE WHEN event_type IN ('error') THEN 'failure'
                        WHEN event_type IN ('click','view') THEN 'engagement'
                        WHEN event_type IN ('purchase','signup') THEN 'conversion'
                        ELSE 'other' END AS kind,
                   count(*) AS n,
                   count(CASE WHEN value > 5.0 THEN 1 END) AS n_high,
                   count(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 END) AS n_early
            FROM events GROUP BY 1 ORDER BY kind"""),
  )

  /** S5 — wide→narrow settings projection with renames (onefs.py:1122-1142,
    * 1376-1396). Column pruning reaches the parquet scan: only 4 of 6
    * columns are read.
    */
  private val settingsProjection = DeclaredQuery(
    "settings_projection",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey").as("id"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"),
          col("o_totalprice").as("total"),
        )
        .orderBy("id"),
    Some("""SELECT o_orderkey AS id, o_orderstatus AS status,
                   o_orderpriority AS priority, o_totalprice AS total
            FROM orders ORDER BY id"""),
  )

  /** F1/F2 — octal render + round-trip parse (onefs.py:823, 1219). */
  private val octalRender = DeclaredQuery(
    "octal_render",
    (s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          col("p_size"),
          conv(col("p_size").cast("string"), 10, 8).as("mode_octal"),
        )
        .withColumn("mode_back", conv(col("mode_octal"), 8, 10).cast("int"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_size, to_base(p_size, 8) AS mode_octal,
                   CAST(CASE WHEN length(to_base(p_size, 8)) = 1
                             THEN CAST(to_base(p_size, 8) AS INTEGER)
                             ELSE CAST(substr(to_base(p_size, 8), 1, length(to_base(p_size, 8)) - 1) AS INTEGER) * 8
                                + CAST(right(to_base(p_size, 8), 1) AS INTEGER)
                        END AS INTEGER) AS mode_back
            FROM part ORDER BY p_partkey"""),
  )

  /** F3 — IPv4 unpack (onefs.py:1186-1196): u32 → dotted quad via
    * shifts + masks, pure integer codegen.
    */
  private val ipUnpack = DeclaredQuery(
    "ip_unpack",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          concat_ws(
            ".",
            shiftright(col("o_orderkey"), 24).bitwiseAND(lit(255L)),
            shiftright(col("o_orderkey"), 16).bitwiseAND(lit(255L)),
            shiftright(col("o_orderkey"), 8).bitwiseAND(lit(255L)),
            col("o_orderkey").bitwiseAND(lit(255L)),
          ).as("ip"),
        )
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   CAST((o_orderkey >> 24) & 255 AS VARCHAR) || '.' ||
                   CAST((o_orderkey >> 16) & 255 AS VARCHAR) || '.' ||
                   CAST((o_orderkey >> 8) & 255 AS VARCHAR) || '.' ||
                   CAST(o_orderkey & 255 AS VARCHAR) AS ip
            FROM orders ORDER BY o_orderkey"""),
  )

  /** F4/F5 — path join/rebase (directories.py:47-63, onefs.py:695-699):
    * zone-relative rebase = strip the zone prefix from the hdfs root, then
    * posix-join each relative path under it; rtrim the trailing sep.
    * The prefix guard (startswith) rides along as a boolean column.
    */
  private val pathRebase = DeclaredQuery(
    "path_rebase", {
      val zonePath = "/ifs/zones/z1"
      val hdfsRoot = s"$zonePath/hadoop-root"
      (s, d) => {
        // zoneHdfs = hdfsRoot with the zonePath prefix stripped → "/hadoop-root"
        val zoneHdfs = regexp_replace(
          lit(hdfsRoot),
          "^" + java.util.regex.Pattern.quote(zonePath),
          "",
        )
        documents(s, d)
          .withColumn("rel", concat(lit("/data/"), col("source"), lit("/")))
          .select(
            col("doc_id"),
            col("source"),
            rtrim(concat(zoneHdfs, lit("/"), ltrim(col("rel"), "/")), "/")
              .as("rebased"),
            lit(hdfsRoot).startsWith(zonePath).as("under_zone"),
          )
          .orderBy("doc_id")
      }
    },
    Some("""SELECT doc_id, source,
                   rtrim('/hadoop-root' || '/' || ltrim('/data/' || source || '/', '/'), '/') AS rebased,
                   starts_with('/ifs/zones/z1/hadoop-root', '/ifs/zones/z1') AS under_zone
            FROM documents ORDER BY doc_id"""),
  )

  /** F8 — id-string parse (onefs.py:1082, 1277): "UID:1025" → 1025. */
  private val splitParse = DeclaredQuery(
    "split_parse",
    (s, d) =>
      customer(s, d)
        .select(
          col("c_custkey"),
          element_at(
            split(concat(lit("UID:"), col("c_custkey").cast("string")), ":"),
            2,
          ).cast("long").as("parsed"),
        )
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
                   CAST(split_part('UID:' || CAST(c_custkey AS VARCHAR), ':', 2) AS BIGINT) AS parsed
            FROM customer ORDER BY c_custkey"""),
  )

  /** F7 — feature-bit arithmetic (onefs.py:1010-1035): word index + bit
    * offset decomposition `(i * 64) + offset`, filtered and ordered.
    */
  private val bitArith = DeclaredQuery(
    "bit_arith",
    (s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          expr("event_id div 64").as("word"),
          (col("event_id") % 64).as("bit"),
        )
        .filter(col("bit") < 8)
        .orderBy("event_id"),
    Some("""SELECT event_id, event_id // 64 AS word, event_id % 64 AS bit
            FROM events WHERE event_id % 64 < 8 ORDER BY event_id"""),
  )

  /** F11 — JSON field extraction + null-classification (onefs.py:297-315
    * error-body decode → Malformed/Undecodable).
    */
  private val jsonExtract = DeclaredQuery(
    "json_extract",
    (s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
        )
        .withColumn(
          "kind",
          when(col("k").isNull, "malformed").otherwise("ok"),
        )
        .orderBy("event_id"),
    Some("""SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                   CASE WHEN json_extract_string(props, '$.k') IS NULL
                        THEN 'malformed' ELSE 'ok' END AS kind
            FROM events ORDER BY event_id"""),
  )

  /** Data-quality profile — the dbt/Deequ-style column audit every
    * ingest gate runs: per column of the events table, null count,
    * distinct count, and min/max rendered as strings (one row per
    * column, fixed-width output whatever the corpus). The unpivot is a
    * literal STACK over the already-aggregated 1-row frame, so the scan
    * is ONE pass computing all columns' aggregates map-side — not one
    * pass per column (the naive profiler's C× scan cost).
    *
    * At 100 TB: one partial+final agg with a fixed number of aggregate
    * buffers; distinct counts are the exact arm — the production knob
    * swaps them for `distinct_sketch`'s bounded-state estimate column
    * by column with the same output shape.
    */
  private val nullProfile = DeclaredQuery(
    "null_profile",
    (s, d) => {
      val ev = events(s, d)
      ev.agg(
        count(lit(1)).as("n"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nn_user"),
        countDistinct("user_id").as("nd_user"),
        min("user_id").cast("string").as("mn_user"),
        max("user_id").cast("string").as("mx_user"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("nn_type"),
        countDistinct("event_type").as("nd_type"),
        min("event_type").as("mn_type"),
        max("event_type").as("mx_type"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("nn_value"),
        countDistinct("value").as("nd_value"),
        // DOUBLE extremes render through a PINNED fixed-point format
        // (micro-units via floor(x·1e6 + 0.5), the suite's integer-scale
        // discipline), never engine-native casts: Spark's cast(string)
        // is Java Double.toString (scientific notation for |x| < 1e-3 or
        // ≥ 1e7) while DuckDB VARCHAR uses shortest-round-trip — same
        // value, different bytes, and the driver gate hashes bytes.
        expr("CAST(CAST(floor(min(value) * 1000000.0 + 0.5) AS BIGINT) AS STRING)")
          .as("mn_value"),
        expr("CAST(CAST(floor(max(value) * 1000000.0 + 0.5) AS BIGINT) AS STRING)")
          .as("mx_value"),
      ).selectExpr(
        """stack(3,
          |  'user_id', n, nn_user, nd_user, mn_user, mx_user,
          |  'event_type', n, nn_type, nd_type, mn_type, mx_type,
          |  'value', n, nn_value, nd_value, mn_value, mx_value
          |) AS (column_name, n_rows, n_null, n_distinct, min_value, max_value)""".stripMargin,
      ).orderBy("column_name")
    },
    Some("""WITH a AS (SELECT count(*) AS n,
                              CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_user,
                              count(DISTINCT user_id) AS nd_user,
                              CAST(min(user_id) AS VARCHAR) AS mn_user,
                              CAST(max(user_id) AS VARCHAR) AS mx_user,
                              CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_type,
                              count(DISTINCT event_type) AS nd_type,
                              min(event_type) AS mn_type,
                              max(event_type) AS mx_type,
                              CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_value,
                              count(DISTINCT value) AS nd_value,
                              CAST(CAST(floor(min(value) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mn_value,
                              CAST(CAST(floor(max(value) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mx_value
                       FROM events)
            SELECT u.* FROM a,
                   LATERAL (VALUES ('user_id', n, nn_user, nd_user, mn_user, mx_user),
                                   ('event_type', n, nn_type, nd_type, mn_type, mx_type),
                                   ('value', n, nn_value, nd_value, mn_value, mx_value))
                     AS u(column_name, n_rows, n_null, n_distinct, min_value, max_value)
            ORDER BY column_name"""),
  )

  val queries: Seq[DeclaredQuery] = Seq(
    suffixProjection,
    ciLookup,
    errorClassify,
    settingsProjection,
    octalRender,
    ipUnpack,
    pathRebase,
    splitParse,
    bitArith,
    jsonExtract,
    nullProfile,
  )
}
