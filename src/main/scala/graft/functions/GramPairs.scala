package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native adjacent-pair extraction over an array<string> column —
  * array<struct<w1, w2>> of the n−1 word transitions, the shared
  * substrate shape of the LM scorers (`bigram_logprob`,
  * `kneser_ney_logprob`) and `cooccurrence_pmi`.
  *
  * The HOF spelling (`zip_with(slice(ws,1,n-1), slice(ws,2,n-1), …)`)
  * computes the same pairs but is CodegenFallback: two array copies
  * plus an interpreted lambda per element, and the projection drops out
  * of whole-stage codegen — the same anti-pattern IntSqDist/IntDot
  * removed from the numeric hot paths (round-13 kernel sweep; this is
  * the round-14 census's text half). One static call keeps the explode
  * projection inside the codegen span; values are identical strings, so
  * the oracles are untouched.
  *
  * Null contract mirrors [[GramHashes]]: null on null input or any null
  * element; fewer than two words yields the empty array (the `IF`
  * guard the HOF spelling needed is built in).
  */
case class GramPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}",
      )
  }

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false,
  )
  override def prettyName: String = "graft_gram_pairs"

  override def nullSafeEval(input: Any): Any =
    GramKernels.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |${ev.value} = graft.functions.GramKernels.pairs($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin,
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native n-gram join over an array<string> column — array<string> of
  * the space-joined g-grams ("a b", "a b c"), the gram shape of
  * `repetition_ratio`'s duplicate-gram fractions and `quality_score`'s
  * bigram features. Same null/short-input contract as [[GramPairs]];
  * `g` is a plan-time constant (2 and 3 are registered as
  * `graft_gram2_join` / `graft_gram3_join`).
  */
case class GramJoin(child: Expression, g: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if g >= 2 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires g >= 2, got $g")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}",
      )
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_gram${g}_join"

  override def nullSafeEval(input: Any): Any =
    GramKernels.joins(input.asInstanceOf[ArrayData], g)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |${ev.value} = graft.functions.GramKernels.joins($a, $g);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin,
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramKernels {

  private val Space = UTF8String.fromString(" ")

  /** Adjacent (wᵢ, wᵢ₊₁) pairs as struct rows; null on any null element,
    * empty below two words. The UTF8Strings are referenced, not copied —
    * the standard Catalyst contract (buffering operators copy via
    * UnsafeProjection), identical to what zip_with's CreateStruct did.
    */
  def pairs(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      i += 1
    }
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = new GenericInternalRow(
        Array[Any](ws.getUTF8String(i), ws.getUTF8String(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined g-grams; null on any null element, empty below g
    * words. One UTF8String.concat per gram (no intermediate strings).
    */
  def joins(ws: ArrayData, g: Int): ArrayData = {
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      i += 1
    }
    if (n < g) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - g + 1)
    val parts = new Array[UTF8String](2 * g - 1)
    var j = 1
    while (j < parts.length) { parts(j) = Space; j += 2 }
    i = 0
    while (i <= n - g) {
      var k = 0
      while (k < g) { parts(2 * k) = ws.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
