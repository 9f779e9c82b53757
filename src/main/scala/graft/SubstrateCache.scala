package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry for persisted per-dataset substrates (dedup shingle
  * table, Jaccard pair table, MinHash/SimHash signatures, LSH codes,
  * scaled IVF embeddings). One working set per session: requesting a
  * substrate for dataset `d` first evicts (unpersists + drops) every
  * substrate the session holds for *other* datasets, so block-manager
  * memory is bounded by one dataset's substrates no matter how many scale
  * factors a long-lived JVM walks through — the round-2 caches keyed
  * (session, sfDir) grew without bound instead.
  *
  * At 100 TB the durable form of a substrate is a parquet table persisted
  * between pipeline stages; this cache is the in-session tier that keeps
  * Bench reps and multi-query runs from recomputing signatures, not a
  * cross-dataset store.
  */
object SubstrateCache {

  private val entries = TrieMap.empty[(SparkSession, String, String), DataFrame]

  // One lock object per key: long builds (the CC fixpoint runs whole Spark
  // jobs) must not block unrelated substrate builds behind a global
  // monitor; only same-key callers serialize.
  private val locks = TrieMap.empty[(SparkSession, String, String), Object]

  /** Get-or-build the persisted, materialized substrate `tag` for
    * (session, dataset). Builds run `persist()` + `count()` so the first
    * caller pays the materialization and later callers read cached
    * partitions. Builds are serialized PER KEY: a concurrent
    * `getOrElseUpdate` could otherwise run the side-effecting build twice
    * and strand the losing persist() in the block manager, while a single
    * global monitor would stall every other session/dataset behind one
    * slow build.
    */
  def substrate(s: SparkSession, d: String, tag: String)(build: => DataFrame): DataFrame = {
    evictStopped()
    evictOthers(s, d)
    val key = (s, d, tag)
    entries.get(key) match {
      case Some(df) => df
      case None =>
        val lock = locks.getOrElseUpdate(key, new Object)
        lock.synchronized {
          entries.get(key) match {
            case Some(df) => df
            case None =>
              val df = build.persist()
              df.count()
              entries.put(key, df)
              df
          }
        }
    }
  }

  /** Unpersist and drop every substrate of `s` cached for a dataset other
    * than `d`.
    */
  def evictOthers(s: SparkSession, d: String): Unit =
    entries.keySet.toList.foreach { k =>
      if ((k._1 eq s) && k._2 != d) {
        entries.remove(k).foreach(_.unpersist(blocking = true))
        locks.remove(k)
      }
    }

  /** Drop every substrate of session `s` (call on session stop). */
  def evictSession(s: SparkSession): Unit =
    entries.keySet.toList.foreach { k =>
      if (k._1 eq s) {
        entries.remove(k).foreach { df =>
          if (!s.sparkContext.isStopped) df.unpersist(blocking = true)
        }
        locks.remove(k)
      }
    }

  /** Release map entries of stopped/replaced sessions so a churned session
    * never pins its DataFrames (their cached blocks died with the context,
    * but the strong map key would otherwise keep the plans on the heap).
    */
  private def evictStopped(): Unit =
    entries.keySet.toList.foreach { k =>
      if (k._1.sparkContext.isStopped) {
        entries.remove(k)
        locks.remove(k)
      }
    }

  /** Datasets this session currently holds substrates for (spec hook). */
  def liveDatasets(s: SparkSession): Set[String] =
    entries.keySet.collect { case (ss, d, _) if ss eq s => d }.toSet

  /** Live substrate count for a session (spec hook). */
  def liveCount(s: SparkSession): Int =
    entries.keySet.count(_._1 eq s)
}
