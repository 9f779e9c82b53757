package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, GraftExtensions}

/** The native codegen'd cosine expression must be bit-identical to the
  * HOF fold formulation (which the DuckDB oracle mirrors), survive the
  * codegen path on real data, and register via both entry points.
  */
class CosineSimilaritySpec extends SparkSpec {

  private val hof =
    """aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)
      | / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v))
      |    * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin

  test("native expression equals the HOF fold bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables
      .embeddings(spark, sfDir)
      .withColumn("dvec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val pairs = e
      .select(col("vec_id").as("ia"), col("dvec").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("dvec").as("b")))
      .filter(col("ia") < col("ib") && col("ia") < 30)
    val diffs = pairs
      .select(
        (expr("cosine_similarity(a, b)") - expr(hof)).as("delta"),
      )
      .filter(col("delta") =!= 0.0)
      .count()
    assert(diffs == 0L, "codegen loop must reproduce the sequential fold exactly")
  }

  test("graft_int_dot equals the HOF integer fold and handles nulls/mismatches") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val e = Tables
      .embeddings(spark, sfDir)
      .withColumn("qv", expr(
        "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 100 + 0.5) AS BIGINT))"))
    val pairs = e
      .select(col("vec_id").as("ia"), col("qv").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("qv").as("b")))
      .filter(col("ia") < col("ib") && col("ia") < 20)
    val diffs = pairs
      .select((expr("graft_int_dot(a, b)") -
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)")).as("delta"))
      .filter(col("delta") =!= 0L)
      .count()
    assert(diffs == 0L, "codegen integer dot must equal the fold exactly")
    val nul = Seq((Seq(1L, 2L), Option.empty[Seq[Long]]))
      .toDF("a", "b").select(expr("graft_int_dot(a, b)")).collect().head
    assert(nul.isNullAt(0))
    intercept[Exception] {
      Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
        .select(expr("graft_int_dot(a, b)")).collect()
    }
  }

  test("null inputs yield null, mismatched types are rejected") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val row = Seq((Seq(1.0, 2.0), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(expr("cosine_similarity(a, b)"))
      .collect()
      .head
    assert(row.isNullAt(0))
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(expr("cosine_similarity(a, b)")).collect()
    }
  }

  test("zero-norm vectors yield null (not NaN), mismatched lengths raise") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // codegen path
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)), (Seq(1.0, 2.0), Seq(0.0, 0.0)))
      .toDF("a", "b")
      .select(expr("cosine_similarity(a, b)"))
      .collect()
    assert(z.forall(_.isNullAt(0)), "zero-norm must be null, not NaN")
    val mismatch = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
        .toDF("a", "b")
        .select(expr("cosine_similarity(a, b)"))
        .collect()
    }
    assert(mismatch.getMessage.contains("length mismatch")
      || mismatch.getCause != null && mismatch.getCause.getMessage.contains("length mismatch"))
    // interpreted path agrees
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val zi = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)))
        .toDF("a", "b")
        .select(expr("cosine_similarity(a, b)"))
        .collect()
      assert(zi.head.isNullAt(0))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("integer kernels fail LOUDLY on overflow — codegen and interpreted paths") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val big = Seq((Seq(Long.MaxValue / 2, Long.MaxValue / 2), Seq(3L, 3L)))
    // dot: (2^62)*3 overflows multiplyExact
    intercept[Exception] {
      big.toDF("a", "b").select(expr("graft_int_dot(a, b)")).collect()
    }
    // sqdist: d = 2^62 - 3 fits, d*d overflows multiplyExact
    intercept[Exception] {
      big.toDF("a", "b").select(expr("graft_int_sqdist(a, b)")).collect()
    }
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      intercept[Exception] {
        big.toDF("a", "b").select(expr("graft_int_dot(a, b)")).collect()
      }
      intercept[Exception] {
        big.toDF("a", "b").select(expr("graft_int_sqdist(a, b)")).collect()
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // in-range values are untouched by the exact ops
    val ok = Seq((Seq(5L, -7L), Seq(11L, 13L))).toDF("a", "b")
      .select(expr("graft_int_dot(a, b)"), expr("graft_int_sqdist(a, b)"))
      .collect()
      .head
    assert(ok.getLong(0) == 5 * 11 + -7 * 13)
    assert(ok.getLong(1) == 36L + 400L)
  }

  test("extension injector wires the same registrations") {
    // builder-level injection can't be exercised on an existing session;
    // validate the injector runs against a fresh extensions container.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("interpreted (non-codegen) eval path matches too") {
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      import spark.implicits._
      val got = Seq((Seq(1.0, 2.0, 3.0), Seq(2.0, 3.0, 4.0)))
        .toDF("a", "b")
        .select(expr("cosine_similarity(a, b)"))
        .as[Double]
        .collect()
        .head
      val exp = {
        val dot = 1.0 * 2 + 2.0 * 3 + 3.0 * 4
        dot / (math.sqrt(1 + 4 + 9) * math.sqrt(4 + 9 + 16))
      }
      assert(got == exp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
