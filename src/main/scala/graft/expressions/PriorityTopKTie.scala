package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer for [[PriorityTopKTie]]: the k lexicographically
  * smallest (priority, tiebreak) rows seen so far, as a max-heap
  * (root = largest kept pair = next to evict). Entries are
  * self-contained UnsafeRows of (priority, tiebreak, payload). */
final class TopKTieBuffer(val k: Int) {
  val heap: mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty(
      Ordering.by((r: UnsafeRow) => (r.getDouble(0), r.getLong(1))))
  def wouldEnter(p: Double, t: Long): Boolean =
    heap.size < k || {
      // total order via Double.compare, matching the heap's Ordering[Double]
      // (Scala total ordering) and Spark's ascending sort: NaN ranks after
      // +Infinity instead of failing every IEEE compare and being silently
      // excluded once the heap is full
      val h = heap.head
      val c = java.lang.Double.compare(p, h.getDouble(0))
      c < 0 || (c == 0 && t < h.getLong(1))
    }
  def insert(row: UnsafeRow): Unit = {
    if (heap.size < k) heap.enqueue(row)
    else if (wouldEnter(row.getDouble(0), row.getLong(1))) {
      heap.dequeue(); heap.enqueue(row)
    }
  }
}

/** `priority_topk_tie(priority, tiebreak, payload, k)` — [[PriorityTopK]]
  * with a DETERMINISTIC total order: payloads of the k lexicographically
  * smallest (priority, tiebreak) rows per group, ordered ascending.
  *
  * Exists for top-k over VALUE priorities, where ties are real and an
  * arbitrary winner breaks engine-portable determinism (the ng5 lesson:
  * every ordering the engine exposes must be total). The hash-priority
  * uses (weighted reservoir sampling, top-p selection) stay on the
  * 3-arg [[PriorityTopK]] — their priorities never tie.
  *
  * Ordering is TOTAL: Double.compare semantics, so NaN priorities rank
  * after +Infinity (same as Spark's ascending sort on the priority
  * column) instead of being dropped by failed IEEE compares. NULL
  * priority/tiebreak/payload rows are skipped — standard aggregate
  * null-in semantics, unlike a window sort's NULLS FIRST — so callers
  * whose score can be NULL (cosine_sim on a zero norm) get "excluded",
  * which is what every call site here wants.
  *
  * Same scale shape as the base aggregate: O(k) state per group inside a
  * regular partial+final hash aggregation — map-side combine ships k
  * rows per (group, partition) instead of every scored row through a
  * window sort. `row_number().over(partitionBy(g).orderBy(p, t)) <= k`
  * shuffles and sorts the WHOLE scored frame; this shuffles k·partitions
  * rows per group. On ss1's brute cosine top-k at sf1.0 that is 4M
  * window-sorted rows replaced by ≤ k·32 rows per query group. */
case class PriorityTopKTie(
    priority: Expression,
    tiebreak: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKTieBuffer] with QuaternaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case other => throw new IllegalArgumentException(
      s"priority_topk_tie: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (priority.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"priority_topk_tie: priority must be DOUBLE, got ${priority.dataType.simpleString}")
    else if (tiebreak.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"priority_topk_tie: tiebreak must be BIGINT, got ${tiebreak.dataType.simpleString}")
    else if (!kExpr.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("priority_topk_tie: k must be an integer literal")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure("priority_topk_tie: k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "priority_topk_tie"

  @transient private lazy val proj =
    UnsafeProjection.create(Array(DoubleType, LongType, payload.dataType))
  @transient private lazy val scratch = new GenericInternalRow(3)

  override def createAggregationBuffer(): TopKTieBuffer = new TopKTieBuffer(k)

  override def update(buf: TopKTieBuffer, input: InternalRow): TopKTieBuffer = {
    val p = priority.eval(input)
    val t = tiebreak.eval(input)
    if (p != null && t != null) {
      val v = payload.eval(input)
      if (v != null) {
        // normalize -0.0 to 0.0: the heap orders via Double.compare
        // (-0.0 < 0.0) while Spark's sort normalizes zeros and falls to
        // the tiebreak — without this a ±0.0 priority at the k boundary
        // could order by sign-of-zero instead of the tiebreak
        val pd0 = p.asInstanceOf[Double]
        val pd = if (pd0 == 0.0d) 0.0d else pd0
        val tl = t.asInstanceOf[Long]
        if (buf.wouldEnter(pd, tl)) {
          scratch.update(0, pd)
          scratch.update(1, tl)
          scratch.update(2, v)
          buf.insert(proj(scratch).copy())
        }
      }
    }
    buf
  }

  override def merge(buf: TopKTieBuffer, other: TopKTieBuffer): TopKTieBuffer = {
    other.heap.foreach(buf.insert)
    buf
  }

  override def eval(buf: TopKTieBuffer): Any = {
    val sorted = buf.heap.toArray
      .sortBy(r => (r.getDouble(0), r.getLong(1)))
    new GenericArrayData(sorted.map(_.get(2, payload.dataType)))
  }

  override def serialize(buf: TopKTieBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKTieBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKTieBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(3)
      row.pointTo(arr, len)
      buf.heap.enqueue(row)
      i += 1
    }
    buf
  }

  override def first: Expression = priority
  override def second: Expression = tiebreak
  override def third: Expression = payload
  override def fourth: Expression = kExpr

  override def withNewMutableAggBufferOffset(newOffset: Int): PriorityTopKTie =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PriorityTopKTie =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(priority = newFirst, tiebreak = newSecond, payload = newThird,
      kExpr = newFourth)
}
