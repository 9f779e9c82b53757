package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The loader normalization contract. The driver has re-encoded
  * events.ts across rounds (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) NTZ);
  * the round-9 bench lost all six temporal queries because the change
  * surfaced at bench time instead of in CI. This spec fails loudly at
  * the LOADER if a future re-encoding escapes `Tables.events`.
  */
class TablesSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("Tables.events always yields a plain TIMESTAMP ts at every scale factor") {
    sfs.foreach { d =>
      val t = Tables.events(spark, d).schema("ts").dataType
      assert(t == TimestampType, s"$d: ts must normalize to TIMESTAMP, got $t")
    }
  }

  test("normalized ts preserves the raw epoch micros (unix_micros ≡ the oracle's epoch_us)") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$d/events.parquet")
    // only meaningful for the current NTZ encoding; under a future
    // encoding the loader test above still gates
    if (raw.schema("ts").dataType == TimestampNTZType) {
      val viaLoader = Tables
        .events(spark, d)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      val viaRaw = raw
        .select(col("event_id"), expr("unix_micros(cast(ts AS TIMESTAMP))").as("us"))
      assert(viaLoader.exceptAll(viaRaw).count() == 0 && viaRaw.exceptAll(viaLoader).count() == 0,
        "loader normalization must be a pure reinterpretation of the stored micros")
    }
  }

  test("every temporal consumer resolves (the round-9 failure mode cannot recur silently)") {
    // unix_micros over the loader output is exactly what broke when the
    // encoding changed; analyzing one representative per call-site family
    // catches a regression at test time
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    ev.select(unix_micros(col("ts"))).queryExecution.analyzed // scalar site
    ev.select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
      .queryExecution
      .analyzed // rendering site
    ev.filter(col("ts") < to_timestamp(lit("2024-01-15 00:00:00")))
      .queryExecution
      .analyzed // LTZ-literal comparison site
  }
}
