package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available by SQL name in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * (For an already-built session, use Bridge.registerGraftFunctions.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      (children: Seq[Expression]) => GraftExtensions.topkBuilder(children)))
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "graft_cosine"),
      (children: Seq[Expression]) => ArrayCosine(children(0), children(1))))
  }
}

object GraftExtensions {
  /** graft_topk(score, id, k): k must fold to a positive int literal.
    * Shared by the extensions path and Bridge.registerGraftFunctions. */
  def topkBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 3, "graft_topk takes (score, id, k)")
    val k = children(2) match {
      case e if e.foldable => e.eval() match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"graft_topk k must be an int literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "graft_topk k must be a foldable literal")
    }
    TopKByScore(children(0), children(1), k)
  }
}
