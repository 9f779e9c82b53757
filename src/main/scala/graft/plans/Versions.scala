package graft.plans

/** Version/feature lattice (SURVEY.md §1.1d): release-string → 64-bit
  * revision table (onefs.py:50-64), interval-dispatch of the client API
  * version (sdk_for_revision, onefs.py:521-563), cluster revision
  * consensus (onefs.py:1240-1249), and feature-bit support
  * (onefs.py:1010-1035). Pure functions — session/config concerns, not
  * queries (SURVEY §2.9 C4) — but part of the reference's library API
  * surface, exercised by its 14-case dispatch test table.
  */
object Versions {

  /** onefs.py:50-64 ONEFS_RELEASES. */
  val Releases: Map[String, Long] = Map(
    "7.2.0.0" -> 0x70200500000000aL,
    "8.0.0.0" -> 0x800005000000025L,
    "8.0.0.4" -> 0x800005000400035L,
    "8.0.1.0" -> 0x800015000000007L,
    "8.0.1.1" -> 0x800015000100070L,
    "8.1.0.0" -> 0x80100500000000bL,
    "8.1.1.0" -> 0x8010150000000d4L,
    "8.1.2.0" -> 0x801025000000010L,
    "8.1.3.0" -> 0x80103500000000dL,
    "8.2.0.0" -> 0x80200500000000bL,
    "8.2.1.0" -> 0x802015000000004L,
    "8.2.2.0" -> 0x802025000000007L,
    "8.2.3.0" -> 0x802035000000000L,
  )

  final class UnsupportedVersionError(revision: Long)
      extends RuntimeException(f"There is no API dialect for revision 0x$revision%x")

  /** Half-open dispatch intervals, oldest→newest: [from, until) → dialect
    * (the reference's eight isi_sdk_* modules become dialect tags here).
    */
  private val dispatch: Seq[(Long, Long, String)] = Seq(
    (Releases("7.2.0.0"), Releases("8.0.0.0"), "7_2"),
    (Releases("8.0.0.0"), Releases("8.0.1.0"), "8_0"),
    (Releases("8.0.1.0"), Releases("8.1.0.0"), "8_0_1"),
    (Releases("8.1.0.0"), Releases("8.1.1.0"), "8_1_0"),
    (Releases("8.1.1.0"), Releases("8.2.0.0"), "8_1_1"),
    (Releases("8.2.0.0"), Releases("8.2.1.0"), "8_2_0"),
    (Releases("8.2.1.0"), Releases("8.2.2.0"), "8_2_1"),
    (Releases("8.2.2.0"), Releases("8.2.3.0"), "8_2_2"),
  )

  /** sdk_for_revision (onefs.py:521-563): interval match; out-of-range
    * revisions fall back to the newest dialect unless strict.
    */
  def dialectForRevision(revision: Long, strict: Boolean = false): String =
    dispatch
      .collectFirst { case (lo, hi, d) if lo <= revision && revision < hi => d }
      .getOrElse {
        if (strict) throw new UnsupportedVersionError(revision)
        dispatch.last._3
      }

  /** Cluster revision consensus (onefs.py:1240-1249): all nodes must
    * agree or the cluster is mid-upgrade (MixedModeError).
    */
  def consensusRevision(nodeRevisions: Map[String, Long]): Long = {
    val distinct = nodeRevisions.values.toSet
    if (distinct.size != 1) throw new graft.MixedModeError(distinct.size.toLong)
    distinct.head
  }

  /** Feature support (onefs.py:1010-1035): a feature (generation, bit) is
    * supported iff some committed word i of that generation carries an
    * offset with bit == i*64 + offset, else generations at-or-below the
    * default are assumed supported. Each committed word carries a *list*
    * of offsets (the reference's gen_bits entries iterate
    * `for offset in offsets` per word) — a word can commit many bits.
    */
  def featureSupported(
      generation: Int,
      bit: Long,
      committed: Seq[(Int, Seq[Long])], // (generation, offsets within word i)
      defaultGeneration: Int,
  ): Boolean = {
    val words = committed.filter(_._1 == generation).map(_._2)
    if (words.isEmpty) generation <= defaultGeneration
    else
      words.zipWithIndex.exists { case (offsets, i) =>
        offsets.exists(offset => bit == i * 64 + offset)
      }
  }
}
