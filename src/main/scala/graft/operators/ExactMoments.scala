package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact covariance moments at ANY corpus size without giving up the
  * fast typed-Aggregator fold (the round-15 magnitude census): the
  * corpus folds through [[graft.functions.CovMomentsAggregator]] in
  * SLICE-BOUNDED groups — so each Long buffer provably stays inside
  * 2⁶³ — and the bounded slice buffers merge in the DECIMAL(38,0) wide
  * tier. Compared to the explode-everything wide formulation this keeps
  * the per-vector cost at the aggregator's in-place buffer update (no
  * D²/2 iterator rows per vector), and compared to the single-group
  * Long tier it is exact at 10¹¹+ vectors instead of dying at ~10⁶.
  */
object ExactMoments {

  /** ≤ this many rows fold into each Long slice buffer. The slice key is
    * `monotonically_increasing_id() DIV SliceRows`: per partition, ids
    * are contiguous from pid·2³³, so buckets hold ≤ SliceRows rows and
    * never collide across partitions (a partition's bucket range
    * [pid·2¹⁶, pid·2¹⁶ + rows/2¹⁷) stays below (pid+1)·2¹⁶ for any
    * partition under 2³³ rows). With per-row second-moment magnitude M,
    * a slice accumulates ≤ SliceRows·M: the ×10⁶(+2×10⁶-shift) k-means
    * projection (M ≈ 1.6×10¹³) stays ≤ 2.1×10¹⁸ < 2⁶³ (4.4× margin);
    * the ×10⁴ covariance quantization (M ≈ 10¹⁰) stays ≤ 1.3×10¹⁵.
    * The Aggregator additionally THROWS (`Math.addExact`) if a caller
    * ever violates its slice bound — loud, never a silent wrap.
    */
  val SliceRows: Long = 131072L

  /** One corpus pass → exact (Σq, Σqᵢqⱼ upper triangle, n) as BigInt.
    * The cross-slice merge is a distributed DECIMAL(38,0) aggregation
    * over (pos, v) scalar rows — numSlices × (D + D(D+1)/2 + 1) of them,
    * map-side combined — and only the (D(D+3)/2 + 1)-row TOTALS collect,
    * driver-tiny at any corpus size. Sums are associative in both tiers,
    * so the result is bit-identical to a single-group pass wherever that
    * pass would not have overflowed.
    */
  def exact(q: DataFrame, vecCol: String, dim: Int): (Seq[BigInt], Seq[BigInt], Long) = {
    val nProds = dim * (dim + 1) / 2
    val mom = udaf(new graft.functions.CovMomentsAggregator(dim))
    val parts = q
      .withColumn("__slice", expr(s"monotonically_increasing_id() DIV $SliceRows"))
      .groupBy("__slice")
      .agg(mom(col(vecCol)).as("m"))
    val totals = parts
      .select(
        posexplode(concat(col("m._1"), col("m._2"), array(col("m._3"))))
          .as(Seq("pos", "v")),
      )
      .groupBy("pos")
      .agg(sum(col("v").cast("decimal(38,0)")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
    if (totals.isEmpty)
      (Seq.fill(dim)(BigInt(0)), Seq.fill(nProds)(BigInt(0)), 0L)
    else
      (
        (0 until dim).map(totals(_)),
        (0 until nProds).map(i => totals(dim + i)),
        totals(dim + nProds).toLong,
      )
  }
}
