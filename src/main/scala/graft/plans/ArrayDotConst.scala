package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of a float-array embedding against a CONSTANT
  * double weight vector — the per-plane projection inside every
  * sign-LSH sketch ([[graft.functions.HashFunctions.planeDot]]), which
  * evaluates `planes`× per row.
  *
  * Bit-parity contract: the HOF reference folds
  * `aggregate(zip_with(emb, lit(w)), 0.0, _+_)` left-to-right; this
  * loop accumulates in the same order, so results are bit-identical
  * (pinned by ArrayCosineSpec's sketch property). Shape semantics: an
  * embedding whose length differs from the weight vector yields null
  * (zip_with pads the short side with null, nulling the fold).
  *
  * Codegen: the weight vector rides along as a reference object
  * (`double[]`), not an unrolled literal list — constant-time setup,
  * one fused loop, no per-element lambda dispatch or zipped-array
  * allocation.
  */
case class ArrayDotConst(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_dot_const requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_const"

  private lazy val w: Array[Double] = weights.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != w.length) return null
    var acc = 0.0
    var i = 0
    while (i < w.length) {
      if (x.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * w(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val wRef = ctx.addReferenceObj("adcWeights", w, "double[]")
      val i = ctx.freshName("adcI")
      val acc = ctx.freshName("adcAcc")
      s"""
         |if ($c.numElements() != $wRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $wRef.length; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $c.getFloat($i) * $wRef[$i];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayDotConst =
    copy(child = newChild)
}
