package graft

import java.nio.file.Files
import graft.streaming.EventStream
import graft.streaming.EventStream.{SessionEvent, UserSession}

/** flatMapGroupsWithState sessionization: every emitted session must match
  * the batch fold exactly; append mode may withhold still-open sessions.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gap = java.time.Duration.ofHours(6)

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events-sess")
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-000.parquet"),
    )
    dir.toString
  }

  /** Batch mirror of the session fold. */
  private def batchSessions(): Seq[UserSession] = {
    val evs = Tables
      .events(spark, sfDir)
      .select("user_id", "ts")
      .as[SessionEvent]
      .collect()
    evs
      .groupBy(_.user_id)
      .toSeq
      .flatMap { case (user, rows) =>
        val ts = rows.map(_.ts.getTime).sorted
        val sessions = Seq.newBuilder[UserSession]
        var start = ts.head
        var end = ts.head
        var n = 1
        ts.tail.foreach { t =>
          if (t - end <= gap.toMillis) { end = t; n += 1 }
          else {
            sessions += UserSession(user, new java.sql.Timestamp(start), new java.sql.Timestamp(end), n)
            start = t; end = t; n = 1
          }
        }
        sessions += UserSession(user, new java.sql.Timestamp(start), new java.sql.Timestamp(end), n)
        sessions.result()
      }
  }

  test("streamed sessions are a prefix-correct subset of the batch fold") {
    val stream = EventStream
      .readEvents(spark, eventsDir)
      .select("user_id", "ts")
      .as[SessionEvent]
    val q = EventStream
      .sessionize(stream, gap)
      .writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ck-sess").toString)
      .start()
    q.awaitTermination(180000)

    val streamed = spark.table("sessions").as[UserSession].collect()
    assert(streamed.nonEmpty, "some sessions must close before end-of-stream")
    val batch = batchSessions()
      .map(s0 => (s0.user_id, s0.session_start, s0.session_end, s0.n_events))
      .toSet
    streamed.foreach { s0 =>
      assert(
        batch.contains((s0.user_id, s0.session_start, s0.session_end, s0.n_events)),
        s"streamed session $s0 not produced by the batch fold",
      )
    }
    // no user may emit overlapping sessions
    streamed.groupBy(_.user_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.session_start.getTime)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.session_end.getTime + gap.toMillis < b.session_start.getTime)
      }
    }
  }
}
