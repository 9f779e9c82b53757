package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass covariance-moment accumulator: for ×10⁴-quantized vectors
  * q ∈ ℤᴰ, a single typed aggregation yields n, the first moments Σqᵢ,
  * and the full upper-triangle second moments Σqᵢqⱼ (row-major, the
  * arithmetic cell layout `embedding_covariance`'s decode table
  * expects).
  *
  * Why an Aggregator and not the explode formulation: the declarative
  * shape (flatten/transform → posexplode → hash agg) is semantically
  * identical but materializes D(D+1)/2 = 2080 iterator rows PER VECTOR
  * before partial aggregation collapses them — row overhead, not
  * arithmetic, dominated `embedding_covariance`'s bench cost. Here each
  * vector updates a mutable Long buffer in place (same multiplies, zero
  * per-product rows), and ObjectHashAggregate keeps ONE buffer per
  * partition for the global group; the exchange carries a single
  * (D + D(D+1)/2 + 1) × 8 B buffer per partition — executors × ~17 KB,
  * corpus-independent, the same partial/merge split as before.
  *
  * Determinism: all-Long arithmetic — associative, commutative, exact —
  * so the result is bit-identical to the explode path under any
  * partitioning (Round11OpsSpec cross-checks the two implementations).
  * Long overflow bounds the BIGINT tier at ~9×10⁸ vectors; every
  * accumulation below goes through `Math.addExact`/`Math.multiplyExact`,
  * so crossing that bound throws `ArithmeticException` rather than
  * silently wrapping (JVM `+`/`*` wrap; ANSI mode only guards Catalyst
  * expressions, not JVM code inside a typed Aggregator — round-11's
  * Scaladoc claimed ANSI covered this path, which was wrong). Past the
  * bound, `covarianceMoments(wide = true)` is the DECIMAL(38) tier.
  * The overflow property is tested ON this class directly
  * (Round12OpsSpec): adversarial-magnitude inputs throw, they do not
  * produce a wrapped finite value.
  */
final class CovMomentsAggregator(dim: Int)
    extends Aggregator[Seq[Long], (Array[Long], Long), (Seq[Long], Seq[Long], Long)] {

  private val nProds = dim * (dim + 1) / 2

  override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  override def reduce(buf: (Array[Long], Long), q: Seq[Long]): (Array[Long], Long) = {
    require(q.length == dim, s"vector dim mismatch: ${q.length} vs $dim")
    val a = if (buf._1.isEmpty) new Array[Long](dim + nProds) else buf._1
    val qa = q.toArray
    var i = 0
    var pos = dim
    while (i < dim) {
      a(i) = Math.addExact(a(i), qa(i))
      var j = i
      while (j < dim) {
        a(pos) = Math.addExact(a(pos), Math.multiplyExact(qa(i), qa(j)))
        pos += 1
        j += 1
      }
      i += 1
    }
    (a, Math.addExact(buf._2, 1L))
  }

  override def merge(
      x: (Array[Long], Long),
      y: (Array[Long], Long),
  ): (Array[Long], Long) =
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) (x._1, x._2 + y._2)
    else {
      val a = x._1
      val b = y._1
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      (a, Math.addExact(x._2, y._2))
    }

  override def finish(buf: (Array[Long], Long)): (Seq[Long], Seq[Long], Long) =
    if (buf._1.isEmpty) (Seq.fill(dim)(0L), Seq.fill(nProds)(0L), 0L)
    else (buf._1.take(dim).toSeq, buf._1.drop(dim).toSeq, buf._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[(Seq[Long], Seq[Long], Long)] =
    ExpressionEncoder[(Seq[Long], Seq[Long], Long)]()
}
