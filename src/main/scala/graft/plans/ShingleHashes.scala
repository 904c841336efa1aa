package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native kernel for the shingle pipeline: token array → distinct
  * hashed word n-grams, in one pass — the unit of near-duplicate
  * comparison feeding the ngram/minhash/decontamination inverted
  * indexes.
  *
  * Replaces the three-stage HOF chain
  * `array_distinct(transform(sequence(...), fold over
  * transform(toks, polyHash)))`, whose every element evaluation is an
  * interpreted lambda dispatch (ArrayTransform/ArrayAggregate have no
  * codegen) with per-stage array allocations. Here: one static JVM
  * method — polyHash per token, rolling n-gram combine
  * `(acc·8191 + h) mod p`, first-occurrence dedup via LinkedHashSet —
  * called from generated code, so the surrounding projection stays in
  * whole-stage codegen.
  *
  * Value parity with the HOF chain (pinned by ShingleHashesSpec on
  * random unicode token lists): same hash constants, same combine
  * order, same first-occurrence distinct order, `< n` tokens → empty
  * array, a null token nulls exactly the shingles containing it
  * (array_distinct keeps one null).
  */
case class ShingleHashes(child: Expression, n: Int,
    ordered: Boolean = false)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String =
    if (ordered) "graft_shingles_ordered" else "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    if (ordered) ShingleHashes.computeOrdered(input.asInstanceOf[ArrayData], n)
    else ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (ordered)
        s"${ev.value} = graft.plans.ShingleHashes.computeOrdered($c, $n);"
      else
        s"${ev.value} = graft.plans.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Must match TextFunctions.HashMod / the 8191 combine of
    * HashFunctions.shingleHashesFrom (duplicated to keep plans free of
    * a functions→plans cycle; pinned by ShingleHashesSpec). */
  private val Mod = 1000000007L
  private val Mul = 8191L

  /** The PolyHash fold (codepoint-aware, identical to plans.PolyHash). */
  def hashToken(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp.toLong) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** tokens → distinct hashed n-gram shingles (first-occurrence order). */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val sz = tokens.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](sz)
    val thNull = new Array[Boolean](sz)
    var i = 0
    while (i < sz) {
      if (tokens.isNullAt(i)) thNull(i) = true
      else th(i) = hashToken(tokens.getUTF8String(i).toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Any]()
    var j = 0
    while (j <= sz - n) {
      var hasNull = false
      var k = 0
      while (k < n) { if (thNull(j + k)) hasNull = true; k += 1 }
      if (hasNull) seen.add(null)
      else {
        var acc = th(j)
        k = 1
        while (k < n) { acc = (acc * Mul + th(j + k)) % Mod; k += 1 }
        seen.add(java.lang.Long.valueOf(acc))
      }
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** tokens → POSITIONAL hashed n-gram shingles (no dedup): element p
    * is the hash of the shingle starting at token p, in document order
    * — winnowing's sliding window needs the sequence, not the set.
    * Same token-hash pass and rolling combine as [[compute]]; a null
    * token nulls exactly the shingles containing it. */
  def computeOrdered(tokens: ArrayData, n: Int): ArrayData = {
    val sz = tokens.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](sz)
    val thNull = new Array[Boolean](sz)
    var i = 0
    while (i < sz) {
      if (tokens.isNullAt(i)) thNull(i) = true
      else th(i) = hashToken(tokens.getUTF8String(i).toString)
      i += 1
    }
    val out = new Array[Any](sz - n + 1)
    var j = 0
    while (j <= sz - n) {
      var hasNull = false
      var k = 0
      while (k < n) { if (thNull(j + k)) hasNull = true; k += 1 }
      if (!hasNull) {
        var acc = th(j)
        k = 1
        while (k < n) { acc = (acc * Mul + th(j + k)) % Mod; k += 1 }
        out(j) = java.lang.Long.valueOf(acc)
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
