package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash:
  * fold `(acc·31 + codePoint) mod p` over the string's Unicode code
  * points (Spark's `split(s,"")` + `ascii` and DuckDB's `string_split` +
  * `ascii` are both codepoint-aware, so the fold must be too — pinned by
  * PolyHashSpec against the HOF reference on surrogate-pair inputs).
  *
  * The higher-order-function formulation cannot participate in
  * whole-stage codegen (ArrayAggregate has no doGenCode) and allocates a
  * per-character slice array; this expression compiles to a tight Java
  * loop inside the generated code. Used by every fingerprint / minhash /
  * simhash hot path; the DuckDB oracles (TextFunctions.polyHashSql) are
  * unchanged because the values are.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression {

  /** Must match TextFunctions.HashMod (duplicated to keep this file free
    * of a functions→plans cycle; pinned by PolyHashSpec). */
  private val Mod = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp.toLong) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("phStr")
      val i = ctx.freshName("phI")
      val cp = ctx.freshName("phCp")
      val acc = ctx.freshName("phAcc")
      s"""
         |java.lang.String $str = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $acc = ($acc * 31L + (long) $cp) % ${Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
