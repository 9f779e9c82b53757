package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Versions

/** The reference's 14-case version-dispatch table
  * (tests/test_onefs.py:61-88) plus consensus and feature-bit semantics.
  */
class VersionsSpec extends AnyFunSuite {
  import Versions._

  private val cases: Seq[(Long, String)] = Seq(
    0L -> "8_2_2", // too old → newest fallback
    Releases("7.2.0.0") -> "7_2",
    Releases("8.0.0.0") -> "8_0",
    Releases("8.0.0.4") -> "8_0",
    Releases("8.0.1.0") -> "8_0_1",
    Releases("8.0.1.1") -> "8_0_1",
    Releases("8.1.0.0") -> "8_1_0",
    Releases("8.1.1.0") -> "8_1_1",
    Releases("8.1.2.0") -> "8_1_1",
    Releases("8.2.0.0") -> "8_2_0",
    Releases("8.2.1.0") -> "8_2_1",
    Releases("8.2.2.0") -> "8_2_2",
    Releases("8.2.3.0") -> "8_2_2", // too new → newest fallback
    Long.MaxValue -> "8_2_2",
  )

  test("the 14-case dispatch table matches the reference") {
    cases.foreach { case (rev, expected) =>
      assert(dialectForRevision(rev) == expected, f"rev 0x$rev%x")
    }
  }

  test("strict mode raises on unsupported revisions") {
    intercept[UnsupportedVersionError](dialectForRevision(0L, strict = true))
    intercept[UnsupportedVersionError](dialectForRevision(Long.MaxValue, strict = true))
  }

  test("revision consensus requires agreement") {
    assert(consensusRevision(Map("1" -> 7L, "2" -> 7L)) == 7L)
    intercept[graft.MixedModeError](consensusRevision(Map("1" -> 7L, "2" -> 8L)))
  }

  test("feature bits: word membership and default-generation fallback") {
    // bit 65 = word 1 * 64 + offset 1 → supported if word 1's offsets hold 1
    assert(featureSupported(2, 65L, Seq((2, Seq(99L)), (2, Seq(1L))), defaultGeneration = 1))
    assert(!featureSupported(2, 65L, Seq((2, Seq(99L)), (2, Seq(2L))), defaultGeneration = 1))
    // a word committing MULTIPLE bits (for offset in offsets, onefs.py:1029-1033)
    assert(featureSupported(2, 65L, Seq((2, Seq(99L)), (2, Seq(0L, 1L, 7L))), defaultGeneration = 1))
    assert(featureSupported(2, 7L, Seq((2, Seq(3L, 7L, 12L))), defaultGeneration = 1))
    assert(!featureSupported(2, 8L, Seq((2, Seq(3L, 7L, 12L))), defaultGeneration = 1))
    // empty offset list on a word commits nothing but still occupies index i
    assert(featureSupported(2, 64L, Seq((2, Seq.empty), (2, Seq(0L))), defaultGeneration = 1))
    // no committed words for the generation → default-generation gate
    assert(featureSupported(1, 0L, Seq.empty, defaultGeneration = 1))
    assert(!featureSupported(2, 0L, Seq.empty, defaultGeneration = 1))
  }
}
