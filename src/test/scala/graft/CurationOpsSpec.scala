package graft

import org.apache.spark.sql.functions._

/** The claimed invariants of the curation queries, pinned beyond the
  * oracle gate: `corpus_shuffle`'s whole point is DETERMINISM (identical
  * order at any partitioning — what `orderBy(rand())` cannot give), and
  * `ngram_novelty`'s scaladoc claims an auditable conservation law
  * (first-occurrence credit lands exactly once per gram).
  */
class CurationOpsSpec extends SparkSpec {

  test("corpus_shuffle is deterministic across re-runs, dense per shard, and balanced") {
    val d = "/root/testdata/sf0.01"
    def run(): Seq[(Long, Long, Long)] =
      SparkEntry
        .queries("corpus_shuffle")(spark, d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    val base = run()
    // the assignment is a pure row function + per-shard rank on a unique
    // key, so a repartitioned re-run must reproduce it bit-for-bit
    val again = run()
    assert(base == again, "re-run must be identical")
    // ranks are dense 1..n within every shard
    val byShard = base.groupBy(_._2)
    for ((shard, rows) <- byShard) {
      val ords = rows.map(_._3).sorted
      assert(ords == (1L to rows.size.toLong), s"shard $shard ranks must be dense from 1")
    }
    // avalanche balance: no shard takes more than 2x its fair share
    val n = base.size
    val fair = n.toDouble / byShard.size
    for ((shard, rows) <- byShard)
      assert(rows.size < 2 * fair, s"shard $shard holds ${rows.size} of $n — hash not mixing")
    // and the order is NOT the identity order (it actually shuffles)
    assert(base.sortBy(t => (t._2, t._3)).map(_._1) != base.map(_._1).sorted,
      "shuffled order must differ from doc_id order")
  }

  test("ngram_novelty conserves first-occurrence credit: sum(novel) = distinct gram count") {
    val d = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("ngram_novelty")(spark, d)
    val novelSum = out.agg(sum("novel")).head().getLong(0)
    val distinctGrams = graft.operators.DedupOps
      .gramRowsOf(Tables.documents(spark, d))
      .select("gh")
      .distinct()
      .count()
    assert(novelSum == distinctGrams,
      s"every gram's first occurrence must be credited exactly once: $novelSum vs $distinctGrams")
    // novelty is a valid ratio and the fixture exercises both regimes
    val range = out.agg(min("novelty"), max("novelty")).head()
    assert(range.getDouble(0) >= 0.0 && range.getDouble(1) <= 1.0)
    assert(range.getDouble(0) < range.getDouble(1), "fixture must spread novelty scores")
  }
}
