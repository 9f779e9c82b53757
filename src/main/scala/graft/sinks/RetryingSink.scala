package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Effect-side retry semantics (reference `accesses_onefs` decorator,
  * onefs.py:566-596): transient errors retry with a fixed backoff,
  * permanent errors propagate. In this engine the *plan* is pure; a sink
  * like this is where plan rows become REST calls/side effects, one
  * partition per task (foreachPartition — connection reuse per task).
  *
  * At scale: retries are per-row inside the task, so one flaky endpoint
  * doesn't restart a whole task; Spark task retry remains the outer
  * safety net for crashes.
  */
object RetryingSink {

  /** Marker for retryable failures (the "Try again" classification,
    * onefs.py:584-594).
    */
  final class TransientError(message: String) extends RuntimeException(message)

  /** Apply `effect` to every plan row, retrying TransientError up to
    * `maxRetries` times with `backoffMs` sleeps (the reference retries
    * forever; a bound is the distributed-good-citizen version).
    */
  def foreachRowWithRetry(
      plan: DataFrame,
      maxRetries: Int = 5,
      backoffMs: Long = 2000L,
  )(effect: Row => Unit): Unit =
    foreachRowWithRetryStateful[Unit](plan, maxRetries, backoffMs)(() => ())((row, _) =>
      effect(row),
    )(_ => ())

  /** Retry variant that threads a mutable per-row state through every
    * attempt and commits it exactly once after the row succeeds. The
    * state is where the effect records what it OBSERVED PERFORMING
    * (set-only flags): an effect applied on an attempt that later threw
    * a TransientError stays recorded, so stats neither double-count
    * (commit happens once) nor undercount (a retry that finds the
    * effect already applied doesn't erase the first attempt's record).
    */
  def foreachRowWithRetryStateful[A](
      plan: DataFrame,
      maxRetries: Int = 5,
      backoffMs: Long = 2000L,
  )(init: () => A)(effect: (Row, A) => Unit)(commit: A => Unit): Unit =
    plan.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { row =>
        val state = init()
        var attempt = 0
        var done = false
        while (!done) {
          try { effect(row, state); done = true }
          catch {
            case e: TransientError =>
              attempt += 1
              if (attempt > maxRetries) throw e
              Thread.sleep(backoffMs)
          }
        }
        commit(state)
      }
    }
}
