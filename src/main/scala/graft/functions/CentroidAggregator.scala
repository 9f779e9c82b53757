package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` summing fixed-point (µ-unit scaled)
  * vectors element-wise — the custom-UDAF extension path for when a
  * reduction genuinely isn't a built-in (here: element-wise vector sum
  * feeding a centroid).
  *
  * Determinism: inputs are pre-scaled to integer micro-units, so the sum
  * is exact Long arithmetic — associative and commutative — and the
  * result is bit-identical regardless of partitioning or merge order
  * (a Double sum would drift under Spark's nondeterministic partial-agg
  * merge order and could never hash-match a single-threaded oracle).
  *
  * Spark runs this as a typed ObjectHashAggregate: `reduce` applies
  * map-side (partial aggregation), `merge` combines partial buffers after
  * a shuffle keyed on the group — same partial/final split as codegen'd
  * hash aggregation, so the shuffle carries one (dims × 8 B) buffer per
  * group per partition, never the vectors.
  */
object CentroidAggregator extends Aggregator[(Int, Seq[Long]), (Seq[Long], Long), (Seq[Long], Long)] {

  override def zero: (Seq[Long], Long) = (Seq.empty, 0L)

  private def add(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"vector dim mismatch: ${a.length} vs ${b.length}")
      a.lazyZip(b).map(_ + _)
    }

  override def reduce(buf: (Seq[Long], Long), in: (Int, Seq[Long])): (Seq[Long], Long) =
    (add(buf._1, in._2), buf._2 + 1L)

  override def merge(x: (Seq[Long], Long), y: (Seq[Long], Long)): (Seq[Long], Long) =
    (add(x._1, y._1), x._2 + y._2)

  override def finish(buf: (Seq[Long], Long)): (Seq[Long], Long) = buf

  override def bufferEncoder: Encoder[(Seq[Long], Long)] = Encoders.product
  override def outputEncoder: Encoder[(Seq[Long], Long)] = Encoders.product
}
