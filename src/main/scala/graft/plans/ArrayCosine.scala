package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity of two float-array
  * embeddings — the hot inner loop of every similarity/embedding-dedup
  * query.
  *
  * Bit-parity contract: HashFunctions.cosine (the HOF reference this
  * replaces on the hot path) computes dot(a,b) / (sqrt(dot(a,a)) *
  * sqrt(dot(b,b))) where each dot is a LEFT-TO-RIGHT fold of
  * `double(x)·double(y)`. The single pass here keeps three independent
  * accumulators, each of which performs exactly that left fold, so the
  * result is bit-identical to the HOF formulation and to the DuckDB
  * oracle's list_reduce rendering (pinned by ArrayCosineSpec on random
  * vectors).
  *
  * Why native: ArrayAggregate/ZipWith have no doGenCode, so the HOF
  * allocates a zipped array and evaluates interpreted lambda calls per
  * element; this compiles to a tight fused Java loop inside whole-stage
  * codegen — no allocation, no virtual calls.
  *
  * Null/shape semantics (HOF parity): null array → null; arrays of
  * different lengths → null (zip_with pads the short side with null,
  * which nulls the fold); a null ELEMENT also nulls the result.
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires two array<float> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("acN")
      val i = ctx.freshName("acI")
      val dot = ctx.freshName("acDot")
      val na = ctx.freshName("acNa")
      val nb = ctx.freshName("acNb")
      val xv = ctx.freshName("acX")
      val yv = ctx.freshName("acY")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}
