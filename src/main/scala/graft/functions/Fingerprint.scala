package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: 32-bit polynomial rolling-hash document
 * fingerprint, `h = Σ (h*31 + codepoint) mod (2^31 - 1)` over the string's
 * code points.
 *
 * Implemented as a codegen'd `UnaryExpression` (not a Scala UDF) so it stays
 * inside whole-stage codegen — at 100 TB the fingerprint pass is a full-corpus
 * scan and a UDF's ser/de boundary would dominate. The polynomial form (vs
 * murmur/xxhash) is chosen because it is exactly reproducible in ANSI-ish SQL
 * (the DuckDB oracle re-derives it with list_reduce over code points).
 */
case class Fingerprint32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint32 requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    Fingerprint32.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + (long) $cp) % 2147483647L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint32 =
    copy(child = newChild)
}

object Fingerprint32 {
  /** Reference implementation (also used by the interpreted path). */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }
}

object Fingerprint {
  /** Column wrapper for [[Fingerprint32]]. */
  def fingerprint32(c: Column): Column =
    GraftColumnBridge.column(Fingerprint32(GraftColumnBridge.expression(c)))
}
