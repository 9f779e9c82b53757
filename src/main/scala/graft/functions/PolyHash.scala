package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial string hash: fold code points, base 31,
  * mod 1e9+7 — bit-identical to the HOF formulation
  * `aggregate(split(w, ''), 0L, (a, c) -> (a * 31 + ascii(c)) % 1000000007)`
  * and to the DuckDB `list_reduce(list_prepend(0, ...))` oracle
  * ([[graft.operators.TextOps.wordHashDuck]]), but a tight generated loop
  * instead of an interpreted lambda + per-character array materialization.
  * This is the hot inner hash of every shingle/fingerprint query, so the
  * interpreted→codegen swap compounds across the whole dedup family.
  *
  * Code points (not UTF-16 units): Spark's `split(w, '')` keeps surrogate
  * pairs together and `ascii` returns the full code point, so folding
  * `String.codePointAt` reproduces the HOF exactly for ALL input, not just
  * ASCII.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}",
      )

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
           |String $s = $a.toString();
           |long $h = 0L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  int $cp = $s.codePointAt($i);
           |  $h = ($h * 31L + $cp) % 1000000007L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = $h;
         """.stripMargin
      },
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass trigram-shingle hashing: array<string> words → array<long>
  * distinct trigram hashes, where each trigram hash equals the [[PolyHash]]
  * char-fold of "w1 w2 w3" via the algebraic composition
  * H(a||b) = H(a)·31^len(b) + H(b) (mod M), separator = ·31 + 32.
  *
  * Why one expression instead of composing `transform`s over (hash, pow)
  * columns: Catalyst's CollapseProject inlines the per-word transforms
  * into EVERY element_at access of the gram lambda, re-evaluating the
  * whole word-array transform per element — O(n²) per document (measured
  * 8× slower at sf0.1). This computes word hashes once and composes all
  * shingles in a single compiled pass, and stays inside whole-stage
  * codegen by emitting one static call per row.
  */
case class GramHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}",
      )
  }

  // null on null input OR any null element (a shingle over a null word is
  // undefined — registered functions must not NPE on adversarial input)
  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    GramHashesUtil.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |${ev.value} = graft.functions.GramHashesUtil.compute($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin,
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashesUtil {
  private val M = 1000000007L

  /** ALL trigram hashes in position order (index i = shingle starting at
    * word i), or null when any element is null. The positional form
    * backs `repeated_spans` (span boundaries need every occurrence, not
    * the set).
    */
  def computeAll(ws: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val n = ws.numElements()
    if (n < 3) return Array.empty[Long]
    val h = new Array[Long](n)
    val p = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      val s = ws.getUTF8String(i).toString
      var hh = 0L
      var pp = 1L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        hh = (hh * 31L + cp) % M
        pp = (pp * 31L) % M
        j += Character.charCount(cp)
      }
      h(i) = hh
      p(i) = pp
      i += 1
    }
    val out = new Array[Long](n - 2)
    var k = 0
    while (k <= n - 3) {
      var g = h(k)
      g = ((g * 31L + 32L) % M * p(k + 1) + h(k + 1)) % M
      g = ((g * 31L + 32L) % M * p(k + 2) + h(k + 2)) % M
      out(k) = g
      k += 1
    }
    out
  }

  /** Word array → distinct trigram hashes (first-occurrence order;
    * downstream consumers are order-insensitive aggregations/joins).
    * Returns null when any element is null.
    */
  def compute(ws: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val all = computeAll(ws)
    if (all == null) return null
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var k = 0
    while (k < all.length) { seen.add(all(k)); k += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** [[computeAll]] boxed for codegen call sites. */
  def computePos(ws: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val all = computeAll(ws)
    if (all == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(all)
  }
}

/** Positional twin of [[GramHashes]]: array<string> words → array<long>
  * of ALL trigram hashes in starting-word order (no distinct). Element i
  * is the hash of words i..i+2, so `posexplode` yields (position, gram)
  * rows — the substrate `repeated_spans` builds duplicated-span islands
  * from. Same algebraic composition, same one-pass codegen shape.
  */
case class GramHashesPos(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}",
      )
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes_pos"

  override def nullSafeEval(input: Any): Any =
    GramHashesUtil.computePos(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
         |${ev.value} = graft.functions.GramHashesUtil.computePos($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin,
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 31^len(s) mod 1e9+7, len in code points — the composition factor of
  * [[PolyHash]]: folding string b onto accumulator a gives
  * a·31^len(b) + H(b) (mod M), so concatenated-string hashes (shingles)
  * compose from per-word (hash, pow) pairs in O(1) per shingle instead of
  * re-folding every character of the concatenation.
  */
case class PolyPow31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}",
      )

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pow31"

  override def nullSafeEval(input: Any): Any = {
    // UTF8String.numChars counts code points — matches PolyHash's fold count
    var n = input.asInstanceOf[UTF8String].numChars()
    var p = 1L
    while (n > 0) { p = (p * 31L) % 1000000007L; n -= 1 }
    p
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n")
        val p = ctx.freshName("p")
        s"""
           |int $n = $a.numChars();
           |long $p = 1L;
           |while ($n > 0) { $p = ($p * 31L) % 1000000007L; $n--; }
           |${ev.value} = $p;
         """.stripMargin
      },
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
