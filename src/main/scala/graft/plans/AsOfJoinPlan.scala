package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan: a native sorted-merge AS-OF join — the
  * rung of the extension ladder above scalar expressions (PolyHash et
  * al.) and aggregates (TopKByScore). Spark has no as-of operator; the
  * library's default formulation is the union+window trick
  * (TemporalJoinQueries.asofLastError — compose-built-ins-first), and
  * THIS node is the engine-level alternative: logical node → Strategy →
  * BinaryExecNode, registered per-session, produced by [[AsOf.join]].
  *
  * Semantics (pinned to match the window formulation exactly): for each
  * left (fact) row, attach the LAST right (marker) row of the same key
  * with marker.time <= fact.time — a marker AT the fact's exact time
  * counts, and equal-time markers resolve to the highest tie-break.
  * Left rows with no eligible marker emit null right columns (left
  * outer).
  *
  * Scale shape: each side is hash-clustered on its key and sorted by
  * (key, time, tie) — one exchange per side, same as any sort-merge
  * join — then each co-partition merges in one pass with O(1) state
  * (the current carried marker, one row copy). No union row-inflation,
  * no window buffering, no per-key materialization; skew behaves like
  * any SMJ partition.
  *
  * AQE note: the exec zips the two children's partitions positionally.
  * AQE's partition coalescing groups the two ENSURE_REQUIREMENTS
  * shuffles of a binary node together (verified under AQE-on sessions,
  * including empty-side and skewed random inputs); if a future rule
  * ever coalesced them asymmetrically, zipPartitions fails LOUDLY with
  * a partition-count mismatch — never a silent mis-merge.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, lb, rb, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lb, rb, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Both sides cluster on their key — EnsureRequirements co-partitions
    * them exactly as it would a sort-merge join's children. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  /** (key, time, tie) ascending on each side: the merge then sees each
    * key's markers in eligibility order, so "last eligible" is a single
    * carried row. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    // NULL-safe, nulls-first: the interpreted ordering alone NPEs on a
    // null key/time (primitive unboxing), while the window-formulation
    // twin happily treats NULL as a joinable group (partitionBy) that
    // sorts first (orderBy, NULLS FIRST). Wrapping the comparators the
    // same way — null == null, null < everything — matches the twin AND
    // this node's own requiredChildOrdering (Ascending = NULLS FIRST),
    // so a null-keyed fact merges against null-keyed markers instead of
    // crashing.
    def nullsFirst(ord: Ordering[Any]): Ordering[Any] = new Ordering[Any] {
      override def compare(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
    }
    val keyOrd = nullsFirst(
      TypeUtils.getInterpretedOrdering(leftKey.dataType))
    val timeOrd = nullsFirst(
      TypeUtils.getInterpretedOrdering(leftTime.dataType))
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // the input schema's right side must be nullable: BindReferences
      // takes nullability from the INPUT attributes, and a non-nullable
      // bound reference reads the null-marker slots as raw zeros when
      // the merge emits the null-padded right row
      val proj = UnsafeProjection.create(outAttrs,
        leftAttrs ++ rightAttrs.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightAttrs.length)
      // iterator rows are reused by the upstream sorter — anything held
      // across next() calls is a copy (the lookahead and the marker)
      var nextR: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var marker: InternalRow = null
      var markerKey: Any = null
      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        if (forward) {
          // FORWARD: the match is the FIRST right row with key == lk and
          // time >= lt. Advance past earlier keys and past same-key rows
          // strictly BEFORE lt; the lookahead row itself is then the
          // match (right is (time, tie)-ascending, so it carries the
          // lowest tie at equal time — the pinned forward tie rule).
          var advancing = true
          while (advancing && nextR != null) {
            val rk = rKeyB.eval(nextR)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0 ||
              (kc == 0 && timeOrd.compare(rTimeB.eval(nextR), lt) < 0)) {
              nextR = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              advancing = false
            }
          }
          val eligible =
            nextR != null && keyOrd.compare(rKeyB.eval(nextR), lk) == 0
          proj(joined(l, if (eligible) nextR else nullRight))
        } else {
          // BACKWARD: consume right rows up to and including (key == lk,
          // time <= lt); rows of earlier keys drain without becoming
          // markers, and the last consumed same-key row is the carried
          // match (highest (time, tie) ≤ the fact's — the pinned rule).
          var advancing = true
          while (advancing && nextR != null) {
            val rk = rKeyB.eval(nextR)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) {
              nextR = if (rIter.hasNext) rIter.next().copy() else null
            } else if (kc == 0 && timeOrd.compare(rTimeB.eval(nextR), lt) <= 0) {
              marker = nextR // already a copy
              markerKey = rk
              nextR = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              advancing = false
            }
          }
          // a marker carried from a previous key is not eligible
          val eligible =
            marker != null && keyOrd.compare(markerKey, lk) == 0
          proj(joined(l, if (eligible) marker else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing constructor: `AsOf.join(facts, markers, "user_id", ...)`.
  * Key/time/tie are column NAMES resolved against each side's analyzed
  * output, so the logical node is born resolved; the planner strategy
  * self-registers on the session (idempotent) — works both under
  * `spark.sql.extensions=graft.plans.GraftExtensions` and on live
  * sessions (specs, shells). */
object AsOf {
  import org.apache.spark.sql.{DataFrame, graftbridge}

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"AsOf.join: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))

  /** `forward = false`: last marker at-or-before each fact (ties to the
    * highest tie-break). `forward = true`: first marker at-or-after
    * (ties to the lowest) — the two directions of the same merge. */
  def join(
      facts: DataFrame, markers: DataFrame,
      key: String, time: String, tie: String,
      forward: Boolean = false): DataFrame = {
    val spark = facts.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = graftbridge.Bridge.logicalPlan(facts)
    // Self-join hygiene: the node is built POST-analysis, so the
    // analyzer's DeduplicateRelations never sees it — if both sides
    // derive from the same base plan they share attribute exprIds, and
    // the optimizer then rewrites one side out from under this node's
    // key expressions. Break the collision up front by re-aliasing
    // every right column (aliases mint fresh exprIds).
    val rPlan = {
      val r0 = graftbridge.Bridge.logicalPlan(markers)
      if (r0.outputSet.intersect(lPlan.outputSet).nonEmpty)
        graftbridge.Bridge.logicalPlan(
          markers.select(markers.columns.toIndexedSeq
            .map(c => markers(c).as(c)): _*))
      else r0
    }
    // left/right types must match EXACTLY: the merge compares key/time
    // with one interpreted ordering and co-hash-partitions both sides —
    // an INT-vs-BIGINT mismatch would otherwise only surface as a
    // ClassCastException deep inside the per-partition merge (or worse,
    // as silently non-colocated partitions)
    Seq(key -> "key", time -> "time", tie -> "tie").foreach {
      case (c, role) =>
        val (l, r) = (attr(lPlan, c), attr(rPlan, c))
        require(l.dataType == r.dataType,
          s"AsOf.join: $role column '$c' dataType mismatch — " +
            s"left ${l.dataType.catalogString} vs right ${r.dataType.catalogString}")
    }
    graftbridge.Bridge.dataFrame(spark,
      AsOfJoin(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, time), attr(rPlan, time),
        attr(lPlan, tie), attr(rPlan, tie), forward))
  }
}
