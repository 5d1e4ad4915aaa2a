package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency summary of capacity k: at most k (item, count)
  * entries; every true count c is bracketed by `cnt ≤ c ≤ cnt + err`
  * where the accumulated decrement `err ≤ N/(k+1)` (N = rows folded in).
  * Merging follows Agarwal et al. 2012 ("Mergeable Summaries"): add
  * counts, then subtract the (k+1)-th largest count from all and drop
  * the non-positive — the N/(k+1) bound survives arbitrary merge trees,
  * which is exactly what a partial+final aggregation executes. */
final class MgBuffer(val k: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty
  var n: Long = 0L // total rows folded in (for the error bound)

  /** Classic MG single-increment step: bump if tracked, insert if room,
    * else decrement every tracked count (the incoming item's virtual
    * count 1 cancels against the decrement — it is not inserted). */
  def add(item: UTF8String): Unit = {
    counts.get(item) match {
      case Some(cur) => counts.update(item, cur + 1L)
      case None =>
        if (counts.size < k) counts.update(item.clone(), 1L)
        else {
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          counts.mapValuesInPlace((_, v) => v - 1L)
          counts.foreach { case (key, v) => if (v <= 0) dead += key }
          dead.foreach(counts.remove)
        }
    }
  }

  /** Shrink to ≤ k entries by subtracting the (k+1)-th largest count. */
  def shrink(): Unit = if (counts.size > k) {
    val sorted = counts.values.toArray.sorted(Ordering[Long].reverse)
    val cut = sorted(k)
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    counts.mapValuesInPlace((_, v) => v - cut)
    counts.foreach { case (key, v) => if (v <= 0) dead += key }
    dead.foreach(counts.remove)
  }
}

/** `freq_sketch(item, k)` — Misra–Gries heavy-hitter summary per group:
  * returns `array<struct<item string, cnt bigint, n bigint>>` sorted by
  * (cnt desc, item asc), where `cnt` is the sketch's LOWER bound on the
  * item's true count and `n` the total rows aggregated. Guarantees, kept
  * under partial/final merge (mergeable-summaries property):
  *
  *  - no over-count: `cnt ≤ true count`;
  *  - bounded under-count: `true count − cnt ≤ n/(k+1)`;
  *  - no false negatives above threshold: any item with
  *    `true count > n/(k+1)` is present.
  *
  * State is O(k) per group through a regular hash aggregation — the
  * bounded-state answer to "top terms of a 10¹² token corpus" where an
  * exact per-item groupBy would shuffle the full type table. The
  * ENTRIES themselves are order-dependent within the error bound (any
  * streaming summary is); deterministic pipelines use the sketch as a
  * candidate SUPERSET and re-count candidates exactly (the hh1 pattern).
  * Items must be STRING; NULL items are skipped entirely (excluded from
  * `n` as well, matching `count(col)` semantics).
  */
case class FreqSketch(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case other => throw new IllegalArgumentException(
      s"freq_sketch: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"freq_sketch: item must be STRING, got ${item.dataType.simpleString}")
    else if (!kExpr.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("freq_sketch: k must be an integer literal")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure("freq_sketch: k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  private val entryType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) {
      buf.n += 1
      buf.add(v.asInstanceOf[UTF8String])
    }
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.n += other.n
    other.counts.foreach { case (key, c) =>
      buf.counts.get(key) match {
        case Some(cur) => buf.counts.update(key, cur + c)
        case None => buf.counts.update(key.clone(), c)
      }
    }
    buf.shrink()
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val sorted = buf.counts.toArray.sortWith { case ((k1, c1), (k2, c2)) =>
      c1 > c2 || (c1 == c2 && k1.compareTo(k2) < 0) }
    new GenericArrayData(sorted.map { case (key, c) =>
      val row = new GenericInternalRow(3)
      row.update(0, key)
      row.update(1, c)
      row.update(2, buf.n)
      row
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    buf.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.counts.update(UTF8String.fromBytes(arr), in.readLong())
      i += 1
    }
    buf
  }

  override def left: Expression = item
  override def right: Expression = kExpr

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(item = newLeft, kExpr = newRight)
}
