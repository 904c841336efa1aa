package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for F1 `clean_customer_name` — the ETL family's hottest
  * scalar (it runs on the fact side of every cartera / pending / ventas
  * query, plus the dim side of each enrichment join).
  *
  * Replaces the four-stage built-in chain
  * `trim(regexp_replace(regexp_replace(lower(trim(c)), "[^a-z0-9\\s]",
  * ""), "\\s+", " "))` — two full regex engine passes with per-row
  * matcher state and two intermediate strings — with one fused pass:
  * trim, lowercase (the exact `UTF8String.toLowerCase` the built-in
  * `lower` calls, so locale/Unicode behavior cannot diverge), then a
  * single char scan that keeps [a-z0-9], collapses whitespace runs
  * ([ \t\n\x0B\f\r] — the Java regex \s set the built-in chain matches)
  * to one space, drops everything else, and never emits a leading or
  * trailing space.
  *
  * Value parity with the regex formulation is pinned by CleanExprSpec on
  * random strings (unicode, surrogate pairs, all-whitespace, embedded
  * control chars). The DuckDB oracles keep their regexp SQL — values are
  * identical, so they are unchanged.
  */
case class CleanName(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_clean_name requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_clean_name"

  override protected def nullSafeEval(input: Any): Any =
    CleanName.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CleanName.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CleanName =
    copy(child = newChild)
}

object CleanName {

  /** Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]. */
  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  def compute(input: UTF8String): UTF8String = {
    // trim + toLowerCase are the SAME UTF8String calls the built-in
    // trim/lower make — byte-identical prefix of the reference chain
    val s = input.trim().toLowerCase().toString
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(ch)
      } else if (isWs(ch)) {
        pendingSpace = true
      }
      // any other char (punctuation, non-ASCII, surrogates): dropped,
      // does NOT separate — exactly what removing it before the \s+
      // collapse does
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native kernel for the F4/F5/F6 numeric-string cleanups: the
  * character-strip stage of the money / thousands-int parses, fused to
  * one pass. The `try_cast` to double stays OUTSIDE the kernel — cast
  * semantics remain Spark's own.
  *
  * Modes (each the exact value twin of its regex formulation, pinned by
  * CleanExprSpec):
  *  - `accounting` (cartera.py:143-149): trim spaces, then '('→'-' and
  *    drop ')', '$', ',' — "($1,234.56)" → "-1234.56"
  *  - `money` (pending_orders.py:139-140): drop '$', ',' and Java-\s
  *    whitespace anywhere
  *  - `thousands` (pending_orders.py:142-143): drop ',' only
  */
case class StripNumeric(child: Expression, mode: String)
    extends UnaryExpression {

  require(StripNumeric.Modes.contains(mode),
    s"graft_strip_numeric mode must be one of ${StripNumeric.Modes}, got $mode")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_strip_numeric requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_strip_numeric"

  private val modeId = StripNumeric.Modes.indexOf(mode)

  override protected def nullSafeEval(input: Any): Any =
    StripNumeric.compute(input.asInstanceOf[UTF8String], modeId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.StripNumeric.compute($c, $modeId);")

  override protected def withNewChildInternal(newChild: Expression): StripNumeric =
    copy(child = newChild)
}

object StripNumeric {

  val Modes: Seq[String] = Seq("accounting", "money", "thousands")

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  def compute(input: UTF8String, modeId: Int): UTF8String = {
    // accounting leads with the same space-only trim as the built-in
    val s = (if (modeId == 0) input.trim() else input).toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      modeId match {
        case 0 => // accounting: ( -> -, drop ) $ ,
          if (ch == '(') sb.append('-')
          else if (ch != ')' && ch != '$' && ch != ',') sb.append(ch)
        case 1 => // money: drop $ , and whitespace
          if (ch != '$' && ch != ',' && !isWs(ch)) sb.append(ch)
        case _ => // thousands: drop , only
          if (ch != ',') sb.append(ch)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
