package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import graft.plans.IdentityPlanner
import graft.sinks.RetryingSink

object EffectSemanticsSpec {
  val attempts = new ConcurrentLinkedQueue[Long]()
}

/** Reference control-flow parity (SURVEY.md §2.9): C1 retry-on-transient,
  * C2 idempotent re-run, A4 duplicate-identity assertion.
  */
class EffectSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("C2: re-planning against the applied state allocates nothing new") {
    val first = SparkEntry.queries("identity_plan")(spark, sfDir).collect()
    // "apply" the plan: every created group/user becomes existing state
    val appliedGroups = first
      .filter(_.getAs[String]("action") == "create_group")
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("id")))
      .toSeq
      .toDF("name", "id")
    val appliedUsers = first
      .filter(_.getAs[String]("action") == "create_user")
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("id")))
      .toSeq
      .toDF("name", "id")
    val second = IdentityPlanner
      .planIdentities(spark, "cdh", "z1", "cl1", 1025L, 1025L, appliedUsers, appliedGroups)
      .collect()
    // identical ids, identical shell lines — the re-run is a no-op plan
    val firstById = first.map(r => (r.getAs[Int]("seq"), r.getAs[String]("shell_line"))).toMap
    second.foreach { r =>
      assert(firstById(r.getAs[Int]("seq")) == r.getAs[String]("shell_line"))
    }
  }

  test("A4: duplicate existing names fail fast instead of duplicating rows") {
    val demand = Seq(("g1", 0), ("g2", 1)).toDF("name", "seq")
    val dupExisting = Seq(("g1", 2000L), ("g1", 3000L)).toDF("name", "id")
    intercept[graft.DuplicateIdentityError] {
      IdentityPlanner.resolveIds(demand, dupExisting, 1025L, "group")
    }
  }

  test("C1: transient failures retry and succeed; permanent failures propagate") {
    val plan = spark.range(0, 20).toDF("id")
    EffectSemanticsSpec.attempts.clear()
    RetryingSink.foreachRowWithRetry(plan, maxRetries = 3, backoffMs = 1L) { row =>
      val id = row.getLong(0)
      val attempts = EffectSemanticsSpec.attempts // static: same JVM in local mode
      attempts.add(id)
      // every 5th row fails once (count occurrences so the retry succeeds)
      if (id % 5 == 0 && java.util.Collections.frequency(attempts, id) == 1)
        throw new RetryingSink.TransientError(s"flaky $id")
    }
    assert(EffectSemanticsSpec.attempts.size == 24, "20 rows + 4 retried")

    intercept[Exception] {
      RetryingSink.foreachRowWithRetry(plan, maxRetries = 2, backoffMs = 1L) { _ =>
        throw new RetryingSink.TransientError("always down")
      }
    }
  }

  test("script sink writes the deterministic artifact") {
    val plan = SparkEntry.queries("identity_plan")(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("script").toString + "/plan"
    IdentityPlanner.writeScript(plan, out)
    val lines = spark.read.textFile(out).collect()
    assert(lines.head == "#!/usr/bin/env sh")
    assert(lines.count(_.startsWith("groupadd")) ==
      plan.filter(col("action") === "create_group").count())
  }
}
