package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, SimilarityOps}

/** Proves the `semantic_dedup` cell-count knob (SCALE.md: "the knob is
  * the cell count") is a COST knob, not a semantics change, wherever the
  * algorithm's own approximation contract holds: on every τ-chain
  * (connected component of the exact cosine-≥-τ graph) whose members
  * land in a single cell under BOTH clusterings, the k=32 drop decisions
  * equal the k=8 ones exactly. Chains that cross cells are the
  * documented SemDeDup approximation — the recall cost of more cells —
  * and are excluded from the equality by construction.
  */
class SemanticDedupSpec extends SparkSpec {

  private val Tau = 0.4

  test("k=32 drop decisions equal k=8 on every τ-chain that is cell-pure in both clusterings") {
    val d = "/root/testdata/sf0.01"
    graft.functions.GraftFunctions.register(spark)

    // exact τ-graph over ALL pairs — the ground truth the clustered
    // variants approximate (500 vectors → 125k cosines, fine in-suite)
    val e = Tables
      .embeddings(spark, d)
      .select(col("vec_id"), expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("dvec"))
    val a = e.select(col("vec_id").as("u"), col("dvec").as("du"))
    val b = e.select(col("vec_id").as("v"), col("dvec").as("dv"))
    val exactPairs = a
      .join(b, col("u") < col("v"))
      .filter(round(expr("cosine_similarity(du, dv)"), 6) >= Tau)
      .select("u", "v")
      .collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")))
    assert(exactPairs.nonEmpty, "fixture must contain τ-near pairs")

    // driver-side union-find over the (small) edge list → τ-chains
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((u, v) <- exactPairs) parent(find(u)) = find(v)
    val chains = exactPairs
      .flatMap { case (u, v) => Seq(u, v) }
      .distinct
      .groupBy(find)
      .values
      .map(_.toSet)
      .toSeq
    assert(chains.nonEmpty)

    def cellMap(k: Int): Map[Long, Int] =
      Ivf
        .cellAssignment(spark, d, k)
        .collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid"))
        .toMap
    val cells8 = cellMap(8)
    val cells32 = cellMap(32)
    assert(cells32.values.toSet.size > cells8.values.toSet.size,
      "k=32 must actually produce a finer clustering than k=8")

    def droppedAt(k: Int): Set[Long] = {
      val survivors = SimilarityOps
        .semanticSurvivors(spark, d, k, Tau)
        .collect()
        .map(_.getAs[Long]("vec_id"))
        .toSet
      cells8.keySet -- survivors // assignment covers every vector at any k
    }
    val dropped8 = droppedAt(8)
    val dropped32 = droppedAt(32)

    // only vectors with a τ-neighbor can ever be dropped, at any k
    val inChains = chains.flatten.toSet
    assert((dropped8 ++ dropped32).subsetOf(inChains))

    val pure = chains.filter { c =>
      c.map(cells8).size == 1 && c.map(cells32).size == 1
    }
    assert(
      pure.exists(_.size >= 2),
      s"fixture must contain a multi-member cell-pure chain (chains=${chains.size})",
    )
    for (c <- pure)
      assert(
        (c & dropped8) == (c & dropped32),
        s"cell-pure chain $c must get identical drop decisions at k=8 and k=32",
      )
  }
}
