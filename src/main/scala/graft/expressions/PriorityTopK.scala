package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer for [[PriorityTopK]]: the k smallest-priority rows seen
  * so far, as a max-heap (root = largest kept priority = next to evict).
  * Entries are self-contained UnsafeRows of (priority, payload). */
final class TopKBuffer(val k: Int) {
  val heap: mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty(Ordering.by((r: UnsafeRow) => r.getDouble(0)))
  def insert(row: UnsafeRow): Unit = {
    if (heap.size < k) heap.enqueue(row)
    else if (row.getDouble(0) < heap.head.getDouble(0)) {
      heap.dequeue(); heap.enqueue(row)
    }
  }
}

/** `priority_topk(priority, payload, k)` — aggregate returning the
  * payloads of the k SMALLEST-priority rows per group, ordered by
  * ascending priority.
  *
  * This is the missing Spark primitive for per-group top-k/sampling: the
  * built-in spellings are either a per-group window sort
  * (`row_number().over(partitionBy(g).orderBy(p)) <= k` — sorts every
  * group in full, one task per group) or a global `orderBy().limit()`
  * (one group only). This aggregate keeps O(k) state per group inside a
  * regular partial+final hash aggregation: each task heap-folds its rows
  * (map-side combine), merges ship k rows per (group, partition) — the
  * shape that survives a 100 TB group.
  *
  * With `priority = -ln(u)/w` where `u = (hash60(key)+1)/2^60` and `w`
  * the row weight, the k smallest priorities are exactly a WEIGHTED
  * RESERVOIR SAMPLE without replacement (Efraimidis–Spirakis A-ES via
  * exponential jumps: keeping the largest `u^(1/w)` ≡ smallest
  * `-ln(u)/w`) — deterministic, engine-portable, retry-safe, unlike any
  * `rand()`-seeded sample.
  *
  * Ties in priority are broken arbitrarily (hash-derived priorities make
  * real ties vanishingly rare); rows with NULL priority or NULL payload
  * are skipped.
  */
case class PriorityTopK(
    priority: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case other => throw new IllegalArgumentException(
      s"priority_topk: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (priority.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"priority_topk: priority must be DOUBLE, got ${priority.dataType.simpleString}")
    else if (!kExpr.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("priority_topk: k must be an integer literal")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure("priority_topk: k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "priority_topk"

  // one UnsafeProjection per task thread; the projected row is REUSED by
  // the projection, so every kept row is copy()'d into its own buffer
  @transient private lazy val proj =
    UnsafeProjection.create(Array(DoubleType, payload.dataType))
  @transient private lazy val scratch = new GenericInternalRow(2)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val p = priority.eval(input)
    if (p != null) {
      val v = payload.eval(input)
      if (v != null) {
        val pd = p.asInstanceOf[Double]
        // cheap pre-check avoids projecting rows that can't enter the heap
        if (buf.heap.size < buf.k || pd < buf.heap.head.getDouble(0)) {
          scratch.update(0, pd)
          scratch.update(1, v)
          buf.insert(proj(scratch).copy())
        }
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach(buf.insert)
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.heap.toArray.sortBy(_.getDouble(0))
    new GenericArrayData(sorted.map(_.get(1, payload.dataType)))
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
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

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      buf.heap.enqueue(row)
      i += 1
    }
    buf
  }

  override def first: Expression = priority
  override def second: Expression = payload
  override def third: Expression = kExpr

  override def withNewMutableAggBufferOffset(newOffset: Int): PriorityTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PriorityTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(priority = newFirst, payload = newSecond, kExpr = newThird)
}
