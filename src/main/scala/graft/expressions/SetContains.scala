package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `set_contains_bc(value)` — EXACT membership probe of a broadcast
  * string set, inside whole-stage codegen: the companion of
  * [[BloomMightContainBc]] for the cases that cannot tolerate false
  * positives and cannot reach an exact verify JOIN — per-ELEMENT probes
  * inside array lambdas (a join can test a row, not an array element),
  * and stateless streaming projections where the exact post-join would
  * force a stateful re-aggregation.
  *
  * The set rides a `sparkContext.broadcast` HANDLE in the plan; the
  * deserialized `HashSet` itself IS the broadcast value, stored once per
  * executor by the block manager — unlike the Bloom form, no parse step
  * exists, so no executor-side cache is needed.
  *
  * SCOPE: exactness costs memory — the dictionary must fit an executor
  * (a `HashSet` runs ~60–100 bytes/entry). That bounds this expression
  * to vocabulary-sized dictionaries (benchmark/eval-suite contamination
  * sets, stop lists, id allowlists); an unbounded dictionary takes the
  * Bloom-prefilter + exact-join path (`Dedup.contaminationBloom`).
  *
  * The set is keyed by [[UTF8String]] (stable equals/hashCode,
  * Externalizable), so the per-element hot-loop probe is
  * allocation-free — the same no-String-materialization stance as
  * `BloomMightContainBc.mightContain`; build it with
  * [[SetContains.setOf]]. Not SQL-registrable (a broadcast handle
  * cannot be a function argument); construct via [[SetContains.probe]].
  */
case class SetContainsBc(bc: Broadcast[java.util.HashSet[UTF8String]],
    child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"set_contains_bc expects a STRING value, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "set_contains_bc"

  def containsValue(v: UTF8String): Boolean = bc.value.contains(v)

  override def nullSafeEval(v: Any): Any =
    containsValue(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("setContainsBc", this,
      classOf[SetContainsBc].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.containsValue($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SetContainsBc = copy(child = newChild)
}

object SetContains {
  /** DataFrame-side constructor:
    * `transform(col("grams"), g => SetContains.probe(bc, g))`. */
  def probe(bc: Broadcast[java.util.HashSet[UTF8String]], value: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SetContainsBc(bc, org.apache.spark.sql.GraftSqlBridge.expression(value)))

  /** Build the broadcastable probe set from plain strings. */
  def setOf(members: IterableOnce[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    members.iterator.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }
}
