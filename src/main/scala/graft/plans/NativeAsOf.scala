package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** NATIVE as-of join — the (c)-tier custom operator: a [[LogicalPlan]]
  * node, a planner [[SparkStrategy]], and a physical [[SparkPlan]] running a
  * per-partition sorted merge. [[graft.operators.AsOfJoin]] remains the
  * compose-first implementation (union + one keyed window, SURVEY §2
  * aj1/s3); this node exists where that composition leaves money on the
  * table — it asks the planner for `ClusteredDistribution` on the keys
  * and `(keys, ts)` child ordering, so `EnsureRequirements` co-partitions
  * the two sides and the join itself is a single streaming pass per
  * partition: no union materialization, no struct-packing of payloads
  * through a window, and the left side's sort can be reused by a
  * downstream operator (the exec preserves left partitioning+ordering).
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] exactly (parity is
  * property-tested): for each left row, the payload of the most recent
  * right row with `r.ts <= l.ts` in the same key group; several right
  * rows on one (keys, ts) resolve to the smallest `tie`; left rows with
  * no prior right row keep NULL payloads (left-outer).
  *
  * Scale shape: one hash shuffle per side (skipped when a side is
  * already partitioned on the keys), per-partition merge is O(|L|+|R|)
  * with O(1) carried state — strictly less data movement than the union
  * form, which shuffles |L|+|R| rows through ONE window partitioning.
  * The same degenerate-mega-key caveat as any keyed operator applies.
  */
object NativeAsOf {

  /** As-of join `left` with `right` (see object doc for semantics —
    * identical to [[graft.operators.AsOfJoin.asOf]], same parameter
    * meaning, same output schema: left columns then
    * `prefix+tsCol, prefix+payload*`). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      payload: Seq[String], tieCol: String, prefix: String = "r_"): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan0 = GraftSqlBridge.analyzed(right)
    // both sides often derive from ONE scan (self-as-of on an event
    // table) and then share exprIds; the analyzer's DeduplicateRelations
    // would re-id the right subtree WITHOUT rewriting this node's stored
    // attributes. Pre-deduplicate: re-alias the right output fresh, so
    // the ids this node captures are the ids that survive analysis.
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOf: column $name not found in [${p.output.map(_.name).mkString(", ")}]"))
    val rightCarry = tsCol +: payload
    val outAttrs = rightCarry.map { c =>
      val a = attr(rPlan, c)
      AttributeReference(prefix + c, a.dataType, nullable = true)()
    }
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, tsCol), attr(rPlan, tsCol), attr(rPlan, tieCol),
      rightCarry.map(attr(rPlan, _)), outAttrs)
    GraftSqlBridge.ofRows(spark, node)
  }

  /** Register [[AsOfJoinStrategy]] once per session (public
    * `experimental.extraStrategies` hook; [[graft.expressions
    * .GraftExtensions]] injects it for externally-built sessions). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
}

/** Logical as-of join node. All attributes are RESOLVED at construction
  * (built from analyzed child plans), so the analyzer sees a complete
  * node; `payloadOut` are fresh attributes this node produces. */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, rightTie: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute])
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  // EXPLICIT: everything the merge consumes. payloadOut carries fresh
  // exprIds, so without this ColumnPruning sees no reference into the
  // right child and prunes it to an EMPTY projection (the left side only
  // survives via `output`) — the classic custom-binary-node trap.
  override def references: AttributeSet = AttributeSet(
    left.output ++ leftKeys ++ rightKeys ++
      Seq(leftTs, rightTs, rightTie) ++ payload)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
final class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.rightTie,
        p.payload, p.payloadOut, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: children arrive co-partitioned on the keys
  * (`ClusteredDistribution`) and sorted by (keys, ts) — right also by
  * the tie column — so each partition is one streaming merge with O(1)
  * carried state: the payload of the latest right (keys, ts) group seen
  * at-or-before the current left row.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, rightTie: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(rightTs, rightTie)).map(SortOrder(_, Ascending)))

  // left rows pass through in order: partitioning and ordering survive,
  // so a downstream keyed operator reuses this exchange/sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val payProj = UnsafeProjection.create(payload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)
      val nullPay = new GenericInternalRow(payloadOut.size)

      // internal values held across rows must own their memory (sorter
      // iterators reuse row buffers)
      def ownTs(v: Any): Any = v match {
        case s: UTF8String => s.copy()
        case d: Decimal => d
        case x => x
      }

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        // latest at-or-before right state: key + ts of the group, payload
        private var heldKey: InternalRow = _
        private var heldTs: Any = _
        private var heldPay: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTsProj(l).get(0, tsType)
          var done = false
          while (!done && rHead != null) {
            val rKey = rKeyProj(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // keys this small can never match a future left row either
              rHead = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0) {
              val rTs = rTsProj(rHead).get(0, tsType)
              if (lTs != null && rTs != null && tsOrd.lteq(rTs, lTs)) {
                val sameGroup = heldPay != null && heldKey != null &&
                  keyOrd.compare(heldKey, lKey) == 0 && tsOrd.equiv(heldTs, rTs)
                if (!sameGroup) {
                  // first row of a new (key, ts) group: smallest tie wins
                  // (right is tie-sorted); later rows of the group skip
                  heldKey = lKey.copy()
                  heldTs = ownTs(rTs)
                  heldPay = payProj(rHead).copy()
                }
                rHead = if (rIter.hasNext) rIter.next() else null
              } else done = true // this and later right rows are in l's future
            } else done = true // right has advanced past l's key
          }
          val pay =
            if (heldPay != null && heldKey != null &&
              keyOrd.compare(heldKey, lKey) == 0) heldPay
            else nullPay
          outProj(joined(l, pay))
        }
      }
    }
  }
}
