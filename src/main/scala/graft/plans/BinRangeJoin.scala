package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a pure range join
  * `probe.t >= win.s AND probe.t < win.s + W` (half-open) or
  * `probe.t >= win.s AND probe.t <= win.s + W` (closed — the BETWEEN
  * spelling, round 10) with W a positive Long literal
  * into the binned equi-join `interval_join_binned` builds by hand —
  * Spark has no range-join strategy, so the naive form plans as a
  * BroadcastNestedLoopJoin (O(n·m) compares); after the rewrite it plans
  * as a hash/sort-merge join on `floor(x / W)` with the original range
  * predicate kept as the exact residual.
  *
  * This is the (c)-tier extension path from SURVEY §2.11 — a
  * `Rule[LogicalPlan]` injected via [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`) or `spark.experimental.extraOptimizations` —
  * used where composing existing operators can't help because the fix
  * must apply to plans the USER wrote naively, not plans the library
  * authored.
  *
  * Semantics-preserving by the bin-cover identity (property-tested in
  * TemporalOpsSpec, rule-tested in BinRangeJoinSpec): with bin width = W,
  * every probe t matching a window [s, s+W) satisfies
  * floor(t/W) ∈ [floor(s/W), floor((s+W−1)/W)], so the exploded ≤2 bins
  * per window cover all candidates and the residual keeps exactness.
  * Floor division is `(x − pmod(x, W)) div W` — correct for negative
  * values too, where bare integral division truncates toward zero.
  *
  * Scope guards: inner joins whose condition is EXACTLY the two range
  * comparisons (a join that already has an equi key hash-partitions
  * fine without help); both bound expressions must be LongType and each
  * must reference exactly one distinct side. INNER only by necessity,
  * not caution: under an outer join the exploded ≤2 bins would emit one
  * null-extended row PER UNMATCHED BIN (duplicating unmatched windows),
  * so an outer rewrite needs a post-join dedup the rule cannot add
  * without changing row identity. The rewrite introduces an
  * equality on the new bin columns, so a second optimizer pass no longer
  * matches — the rule is idempotent under fixed-point batches.
  *
  * Overflow assumption: the upper-bin expression `floor((s + W − 1) / W)`
  * wraps if s > Long.MaxValue − W under non-ANSI arithmetic, and the
  * wrapped bin diverges from the (also-wrapping) original predicate. The
  * rule targets epoch timestamps/sequence numbers, which sit ~1e9–1e18
  * below Long.MaxValue, so no runtime guard is added; callers binning
  * adversarial Long domains near MaxValue should disable the rule.
  */
object BinRangeJoin extends Rule[LogicalPlan] {

  /** Matches `(t >= s AND t < s + W)` (half-open) or
    * `(t >= s AND t <= s + W)` (closed — the BETWEEN spelling) in any
    * operand arrangement; returns (t, s, W, closed). The closed form
    * covers ≤2 bins too (the span is still exactly W), only the upper
    * exploded bin moves from floor((s+W−1)/W) to floor((s+W)/W).
    */
  private def extractRange(cond: Expression): Option[(Expression, Expression, Long, Boolean)] = {
    def lowerOf(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(t1, s1) => Some((t1, s1))
      case LessThanOrEqual(s1, t1) => Some((t1, s1))
      case _ => None
    }
    def upperOf(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      case LessThan(t2, up) => Some((t2, up, false))
      case LessThanOrEqual(t2, up) => Some((t2, up, true))
      case GreaterThan(up, t2) => Some((t2, up, false))
      case GreaterThanOrEqual(up, t2) => Some((t2, up, true))
      case _ => None
    }
    def wOf(upper: Expression, s1: Expression): Option[Long] = upper match {
      case Add(s2, Literal(ww: Long, LongType), _) if s2.semanticEquals(s1) => Some(ww)
      case Add(Literal(ww: Long, LongType), s2, _) if s2.semanticEquals(s1) => Some(ww)
      case _ => None
    }
    def tryPair(lo: Expression, up: Expression): Option[(Expression, Expression, Long, Boolean)] =
      for {
        (t1, s1) <- lowerOf(lo)
        (t2, upper, closed) <- upperOf(up)
        ww <- wOf(upper, s1)
        if ww > 0 && t1.semanticEquals(t2) &&
          t1.dataType == LongType && s1.dataType == LongType
      } yield (t1, s1, ww, closed)
    cond match {
      case And(a, b) => tryPair(a, b).orElse(tryPair(b, a))
      case _ => None
    }
  }

  /** Sign-correct floor(x / w) for Long x: pmod is non-negative, so
    * subtracting it always rounds DOWN before the exact division.
    */
  private def floorBin(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  private def rewrite(
      j: Join,
      winSide: LogicalPlan,
      probeSide: LogicalPlan,
      t: Expression,
      s: Expression,
      w: Long,
      closed: Boolean,
      swapped: Boolean,
  ): LogicalPlan = {
    // window side: explode the ≤2 covered bins
    // Sequence is TimeZoneAwareExpression: without an explicit zone id it
    // reports unresolved and fails optimizer plan validation, even for
    // integral sequences
    val binsAlias = Alias(
      new Sequence(
        floorBin(s, w),
        floorBin(Add(s, Literal(if (closed) w else w - 1)), w),
        None,
        Some(conf.sessionLocalTimeZone),
      ),
      "graft_bins",
    )()
    val winProj = Project(winSide.output :+ binsAlias, winSide)
    val binW = AttributeReference("graft_bin_w", LongType)()
    val gen = Generate(
      Explode(binsAlias.toAttribute),
      unrequiredChildIndex = Seq(winSide.output.size), // the bins array itself
      outer = false,
      qualifier = None,
      generatorOutput = Seq(binW),
      child = winProj,
    )
    // probe side: one bin per row
    val binP = Alias(floorBin(t, w), "graft_bin_p")()
    val probeProj = Project(probeSide.output :+ binP, probeSide)
    val newCond = And(EqualTo(binW, binP.toAttribute), j.condition.get)
    // When the window side came from the original RIGHT child the new join
    // has its children flipped, so per-side hints (e.g. broadcast) must flip
    // with them or a user hint silently targets the wrong relation.
    val hint = if (swapped) JoinHint(j.hint.rightHint, j.hint.leftHint) else j.hint
    Project(j.output, Join(gen, probeProj, Inner, Some(newCond), hint))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      extractRange(cond) match {
        case Some((t, s, w, closed))
            if t.references.subsetOf(right.outputSet) && t.references.nonEmpty &&
              s.references.subsetOf(left.outputSet) && s.references.nonEmpty =>
          rewrite(j, winSide = left, probeSide = right, t, s, w, closed, swapped = false)
        case Some((t, s, w, closed))
            if t.references.subsetOf(left.outputSet) && t.references.nonEmpty &&
              s.references.subsetOf(right.outputSet) && s.references.nonEmpty =>
          rewrite(j, winSide = right, probeSide = left, t, s, w, closed, swapped = true)
        case _ => j
      }
  }
}
