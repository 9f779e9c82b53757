package graft

/** Substrate-cache lifecycle: block-manager memory must stay bounded by
  * ONE dataset's substrates when a long-lived session walks multiple scale
  * factors (the round-2 caches accumulated instead).
  */
class CacheLifecycleSpec extends SparkSpec {

  private val dA = "/root/testdata/sf0.001"
  private val dB = "/root/testdata/sf0.01"

  test("switching datasets evicts the previous dataset's substrates") {
    // hermetic start: other suites sharing this session may have left
    // substrates for dA, which would inflate countA vs countB
    SubstrateCache.evictSession(spark)
    // populate several substrates for dataset A
    SparkEntry.queries("ngram_jaccard")(spark, dA).count()
    SparkEntry.queries("minhash_near_dup")(spark, dA).count()
    SparkEntry.queries("ivf_ann")(spark, dA).count()
    val countA = SubstrateCache.liveCount(spark)
    val rddsA = spark.sparkContext.getPersistentRDDs.size
    assert(countA >= 3, s"expected substrates for A, got $countA")
    assert(SubstrateCache.liveDatasets(spark) == Set(dA))

    // same queries on dataset B: A's substrates must be unpersisted, not
    // accumulated beside B's
    SparkEntry.queries("ngram_jaccard")(spark, dB).count()
    SparkEntry.queries("minhash_near_dup")(spark, dB).count()
    SparkEntry.queries("ivf_ann")(spark, dB).count()
    assert(SubstrateCache.liveDatasets(spark) == Set(dB))
    assert(SubstrateCache.liveCount(spark) == countA, "same working-set size")
    val rddsB = spark.sparkContext.getPersistentRDDs.size
    assert(rddsB <= rddsA, s"persisted RDDs grew across datasets: $rddsA -> $rddsB")

    // leave the shared session on the suite-default dataset
    SubstrateCache.evictOthers(spark, dA)
    assert(SubstrateCache.liveCount(spark) == 0)
  }
}
