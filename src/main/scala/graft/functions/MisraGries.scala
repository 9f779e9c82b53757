package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries / SpaceSaving heavy-hitters summary as a typed, MERGEABLE
  * `Aggregator[String, Map, Map]` — the bounded-state distributed top-k
  * primitive that needs NO probe set (count-min answers "how often is
  * THIS key", Misra–Gries answers "WHICH keys are frequent"):
  *
  *  - `reduce` keeps at most k counters; a key beyond capacity decrements
  *    every counter (the classic k-way cancellation), so each counter
  *    undercounts its key's true frequency by at most n/(k+1).
  *  - `merge` (Agarwal et al., "Mergeable Summaries") adds counters
  *    pointwise, then subtracts the (k+1)-th largest value and drops
  *    non-positive survivors — the merged summary keeps the SAME n/(k+1)
  *    error bound, which is what makes the sketch safe for Spark's
  *    arbitrary partial-agg merge trees.
  *
  * Guarantee (spec-pinned): any key with true count > n/(k+1) SURVIVES in
  * the summary, and each estimate lies in [true − n/(k+1), true]. The
  * SUMMARY CONTENT depends on merge order, so this is a library/streaming
  * surface, not a declared oracle query — the deterministic alternatives
  * (`token_topk` exact, `cms_heavy_hitters` probed) cover the oracle
  * path; Misra–Gries covers the "unknown key space, one pass, fixed
  * memory" production case.
  *
  * At 100 TB: state is k counters per partition buffer — shuffle bytes
  * are O(k × partitions), independent of corpus size or key cardinality.
  */
final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < k => buf.updated(key, 1L)
      case None =>
        // decrement-all: cancels one occurrence of k+1 distinct keys
        buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (key, c)) => m.updated(key, m.getOrElse(key, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everyone; ≤ k survive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
}
