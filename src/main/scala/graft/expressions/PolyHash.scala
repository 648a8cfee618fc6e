package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint over a string's bytes:
  * `h ← (h·257 + byte) mod 1_000_000_007` — the classic Rabin–Karp-style
  * document fingerprint, as a native codegen'd expression so corpus-scale
  * fingerprinting runs as a tight loop inside whole-stage codegen.
  *
  * The modulus keeps the accumulator under 2^38, so the fold needs no
  * 128-bit arithmetic. For ASCII text the byte sequence equals the
  * codepoint sequence, which is what the DuckDB oracle mirrors
  * (`list_reduce(list_prepend(0, codes), (h,b) -> (h*257+b) % 1e9+7)`).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires STRING input, got ${child.dataType}")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 257L + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 257L + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def apply(c: Column): Column = GraftBridge.column(PolyHash(GraftBridge.expression(c)))
}
