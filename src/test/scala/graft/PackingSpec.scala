package graft

/** Behavioral contract of the two sequence-packing variants.
  *
  * `sequence_pack` assigns whole documents to the pack their first token
  * falls in — simple manifest, but a pack's `tok_total` may exceed the
  * budget when a long doc straddles the boundary. `sequence_pack_split`
  * is the production loader form: straddling docs are split, so every
  * pack is exactly full (last pack excepted). These tests pin the
  * invariants that distinguish them and the conservation law both share.
  */
class PackingSpec extends SparkSpec {

  private lazy val whole = SparkEntry.queries("sequence_pack")(spark, sfDir).collect()
  private lazy val split = SparkEntry.queries("sequence_pack_split")(spark, sfDir).collect()

  private def tok(rows: Array[org.apache.spark.sql.Row]): Map[Long, Long] =
    rows.map(r => r.getAs[Long]("pack_id") -> r.getAs[Long]("tok_total")).toMap

  test("split packing never exceeds the budget; every non-final pack is exactly full") {
    val byPack = tok(split)
    val last = byPack.keys.max
    byPack.foreach { case (p, t) =>
      assert(t <= graft.operators.PipelineOps.PackBudget, s"pack $p overflows: $t")
      if (p != last)
        assert(t == graft.operators.PipelineOps.PackBudget, s"pack $p not full: $t")
    }
  }

  test("whole-doc packing DOES overflow on the fixtures — the variants are distinguishable") {
    assert(tok(whole).values.exists(_ > graft.operators.PipelineOps.PackBudget),
      "no whole-doc pack exceeds the budget at this sf — the split variant would be untestable")
  }

  test("both variants conserve the corpus token total and cover the same pack range") {
    val corpusToks = graft.Tables.documents(spark, sfDir)
      .selectExpr("cast(sum(size(split(text, '\\\\s+'))) as bigint) as t")
      .collect()(0).getAs[Long]("t")
    assert(tok(whole).values.sum == corpusToks)
    assert(tok(split).values.sum == corpusToks)
    // pack ids are the contiguous prefix of the token line in both forms
    val ids = split.map(_.getAs[Long]("pack_id")).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L, "split pack ids must be contiguous from 0")
  }

  test("a straddling doc appears in every pack it spans (slice counts exceed doc counts)") {
    val wholeDocs = whole.map(_.getAs[Long]("n_docs")).sum
    val sliceDocs = split.map(_.getAs[Long]("n_docs")).sum
    assert(sliceDocs > wholeDocs,
      "split slices must outnumber whole-doc assignments when any doc straddles a boundary")
  }

  test("BPE packing conserves the encoder's corpus token total and assigns every doc once") {
    val bpe = SparkEntry.queries("sequence_pack_bpe")(spark, sfDir).collect()
    // corpus BPE total via the encoder's word->count map, independently
    val corpusBpe = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "explode(split(text, ' ')) as w")
      .join(graft.operators.BpeOps.bpeWordTokenCounts(spark, sfDir), Seq("w"))
      .selectExpr("cast(sum(wtok) as bigint) as t")
      .collect()(0).getAs[Long]("t")
    assert(bpe.map(_.getAs[Long]("tok_total")).sum == corpusBpe,
      "packs must conserve the encoded corpus token total")
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(bpe.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "whole-doc BPE packing must assign every document exactly once")
    // BPE counts exceed whitespace counts with a 10-merge model, so the
    // BPE pack line must be strictly longer — the variants are
    // distinguishable and the composition is doing real work
    assert(bpe.length > whole.length,
      s"expected more BPE packs (${bpe.length}) than whitespace packs (${whole.length})")
  }
}
