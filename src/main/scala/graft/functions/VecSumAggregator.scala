package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise BIGINT vector sum: the centroid-update accumulator for
  * the k-means family (and any per-group integer vector fold). Each row
  * updates a mutable Long buffer in place — no posexplode of dims×rows
  * iterator rows before partial aggregation collapses them (the same
  * row-overhead argument as [[CovMomentsAggregator]], whose bench win
  * motivated this shape); the exchange carries one D×8 B buffer per
  * (partition, group), i.e. executors × clusters × ~0.5 KB for D = 64 —
  * corpus-independent.
  *
  * Determinism: all-Long arithmetic — associative, commutative, exact —
  * so the sum is bit-identical under any partitioning, which is what
  * lets the k-means oracle unroll the same update in DuckDB and
  * hash-match. Accumulation goes through `Math.addExact` (JVM `+`
  * wraps; ANSI guards Catalyst expressions, not JVM code inside a typed
  * Aggregator), so crossing the Long bound throws instead of silently
  * corrupting a centroid — at |q| ≤ 4×10⁶ that bound is ~2×10¹² rows
  * per cluster; past it, the covariance pattern's DECIMAL(38) tier is
  * the documented swap.
  */
final class VecSumAggregator(dim: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
    require(q.length == dim, s"vector dim mismatch: ${q.length} vs $dim")
    val a = if (buf.isEmpty) new Array[Long](dim) else buf
    val qa = q.toArray
    var i = 0
    while (i < dim) {
      a(i) = Math.addExact(a(i), qa(i))
      i += 1
    }
    a
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      var i = 0
      while (i < x.length) { x(i) = Math.addExact(x(i), y(i)); i += 1 }
      x
    }

  override def finish(buf: Array[Long]): Seq[Long] =
    if (buf.isEmpty) Seq.fill(dim)(0L) else buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
