package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
