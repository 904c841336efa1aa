package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k highest-scoring (score, id)
  * pairs per group — ties broken toward the LOWER id, matching the
  * `ORDER BY cosine DESC, neighbor_id ASC` convention of every ranked
  * query in this engine. Returns the winners best-first as
  * `array<struct<score double, id bigint>>`.
  *
  * Why a custom aggregate: the rank-window formulation of top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC)` then
  * `rank <= k`) must SHUFFLE every scored row to the window — |Q|·n
  * rows for a k-NN scoring stage — before discarding all but k. No
  * built-in aggregate can do better: `max_by(id, score)` keeps one,
  * `collect_list` is unbounded (its partial state is the whole group).
  * This TypedImperativeAggregate holds a k-bounded heap, so the
  * map-side partial pass reduces each partition to ≤ k pairs per group
  * and the shuffle carries only serialized k-element buffers —
  * |Q|·k·partitions instead of |Q|·n rows. That is the difference
  * between a top-k that survives 100 TB and one that re-shuffles the
  * corpus.
  *
  * Buffer = a worst-on-top priority queue (eviction candidate at the
  * head); merge re-inserts, eval sorts best-first. Serialization is a
  * flat (size, pairs...) byte stream for shuffle between partial and
  * final aggregation (ObjectHashAggregateExec).
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"graft_topk needs k > 0, got $k")

  /** Head = the element to evict: lowest score; on ties the higher id. */
  private object WorstFirst extends Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires (double, bigint), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](WorstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit =
    if (buf.size < k) buf.enqueue((s, i))
    else {
      // the SAME total order as the heap and eval (Double.compare), not
      // IEEE primitives: `s > ws` is false for a NaN candidate, which
      // would silently drop it while the rank-window twin ranks NaN
      // first (Spark sorts NaN greater than any double) — and
      // 0.0 == -0.0 under IEEE but not under the heap's ordering
      if (WorstFirst.compare((s, i), buf.head) < 0) {
        buf.dequeue(); buf.enqueue((s, i))
      }
    }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // best-first = ascending WorstFirst (greater ⇔ worse) — the one
    // total order everywhere (a -s sortBy would re-introduce IEEE
    // negation semantics for NaN)
    val arr = buf.toArray.sorted(WorstFirst)
    new GenericArrayData(arr.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
