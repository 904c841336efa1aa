package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available by SQL name in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * (For an already-built session, use Bridge.registerGraftFunctions —
  * both paths register [[GraftExtensions.functions]], the single list,
  * so the two registries cannot drift.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      require(children.length == n,
        s"$name takes exactly $n arguments, got ${children.length}")
      build(children)
    }

  /** graft_topk(score, id, k): k must fold to a positive int literal. */
  def topkBuilder(children: Seq[Expression]): Expression =
    arity("graft_topk", 3) { cs =>
      val k = cs(2) match {
        case e if e.foldable => e.eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an int literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "graft_topk k must be a foldable literal")
      }
      TopKByScore(cs(0), cs(1), k)
    }(children)

  /** The full SQL surface, registered identically by the extensions
    * path and by Bridge.registerGraftFunctions. (ArrayDotConst carries
    * constant weights in the expression tree, not as a SQL argument, so
    * it is Scala-API only.) */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      arity("graft_polyhash", 1)(cs => PolyHash(cs.head))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      topkBuilder _),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "graft_cosine"),
      arity("graft_cosine", 2)(cs => ArrayCosine(cs(0), cs(1)))),
    (FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[ArrayL2Sq].getName, "graft_l2sq"),
      arity("graft_l2sq", 2)(cs => ArrayL2Sq(cs(0), cs(1)))),
    (FunctionIdentifier("graft_clean_name"),
      new ExpressionInfo(classOf[CleanName].getName, "graft_clean_name"),
      arity("graft_clean_name", 1)(cs => CleanName(cs.head))),
    (FunctionIdentifier("graft_strip_numeric"),
      new ExpressionInfo(classOf[StripNumeric].getName, "graft_strip_numeric"),
      arity("graft_strip_numeric", 2) { cs =>
        val mode = cs(1) match {
          case e if e.foldable => String.valueOf(e.eval())
          case _ => throw new IllegalArgumentException(
            "graft_strip_numeric mode must be a foldable string literal")
        }
        StripNumeric(cs(0), mode)
      }))
}
