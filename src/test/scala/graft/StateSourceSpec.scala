package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, IsNotNull, LessThan}
import org.apache.spark.sql.types.StructType
import graft.sources.{StateRange, StateScanBuilder}

/** The DataSource V2 connector: pushdown narrows the generated range at
  * the source, partitioning honors `slices`, and the end-to-end rows are
  * the deterministic synthetic state.
  */
class StateSourceSpec extends SparkSpec {

  test("filter pushdown narrows the scan range; non-id filters stay residual") {
    val b = new StateScanBuilder(rows = 1000L, slices = 4)
    val residual = b.pushFilters(
      Array(
        GreaterThanOrEqual("id", 100L),
        LessThan("id", 600L),
        EqualTo("kind", "user"), // not consumable at the source
        IsNotNull("id"),
      ),
    )
    assert(b.lo == 100L && b.hi == 600L, "range must narrow at the source")
    assert(residual.toSet == Set[Any](EqualTo("kind", "user"), IsNotNull("id")))
    assert(b.pushedFilters().length == 2)
    val parts = b.build().toBatch.planInputPartitions()
    assert(parts.length == 4)
    val ranges = parts.map(_.asInstanceOf[StateRange])
    assert(ranges.map(r => r.hi - r.lo).sum == 500L, "partitions cover exactly the pushed range")
    assert(ranges.head.lo == 100L && ranges.last.hi == 600L)
  }

  test("column pruning drops unprojected columns from the reader schema") {
    val b = new StateScanBuilder(rows = 10L, slices = 1)
    b.pruneColumns(StructType(graft.sources.StateSource.schema.filter(_.name == "id")))
    assert(b.build().readSchema().fieldNames.toSeq == Seq("id"))
  }

  test("end-to-end read: deterministic rows, slice count, pushdown plan") {
    val df = spark.read
      .format("graft.sources.StateSource")
      .option("rows", "300")
      .option("slices", "3")
      .load()
    assert(df.rdd.getNumPartitions == 3)
    val got = df
      .filter(col("id") >= 10 && col("id") < 16)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val expected = (10L until 16L).map { i =>
      val kind = (i % 3) match { case 0 => "user"; case 1 => "group"; case _ => "proxy" }
      (i, s"u$i", s"z${i % 5}", kind)
    }
    assert(got.toSeq == expected)
    // the pushed range shows up in the scan description
    val plan = df.filter(col("id") >= 10 && col("id") < 16).queryExecution.executedPlan.toString
    assert(plan.contains("graft_state"), plan)
  }

  test("micro-batch stream pages the table and emits every row exactly once") {
    val df = spark.readStream
      .format("graft.sources.StateSource")
      .option("rows", "1000")
      .option("slices", "2")
      .option("batchRows", "300") // 1000 rows / 300 per page → 4 batches
      .load()
    val q = df.writeStream
      .format("memory")
      .queryName("state_stream")
      .outputMode("append")
      .option(
        "checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-state").toString,
      )
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("state_stream").collect()
      assert(rows.length == 1000, "every row exactly once")
      assert(rows.map(_.getLong(0)).distinct.length == 1000)
      assert(rows.map(_.getLong(0)).min == 0L && rows.map(_.getLong(0)).max == 999L)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4, "paging must take multiple batches")
    } finally q.stop()
  }

  test("empty pushed range yields no partitions") {
    val b = new StateScanBuilder(rows = 100L, slices = 4)
    b.pushFilters(Array(GreaterThanOrEqual("id", 90L), LessThan("id", 10L)))
    assert(b.build().toBatch.planInputPartitions().isEmpty)
  }
}
