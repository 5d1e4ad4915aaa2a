package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter_bytes, value)` — membership probe of a
  * serialized `org.apache.spark.util.sketch.BloomFilter` against a string
  * column, inside whole-stage codegen.
  *
  * This is the engine's broadcast-semi-join primitive: build the sketch
  * over the small/dictionary side once (`Dedup.bloomOf`, a treeAggregate),
  * embed the bytes as a foldable literal, and filter the 100 TB side with
  * a pure narrow scan — rows that fail the probe never reach the shuffle.
  * False positives pass the probe (by design); callers that need exact
  * results keep the exact join AFTER the probe, which then only sees the
  * surviving sliver. The same shape Spark's own runtime row-group
  * filtering uses, exposed as a composable function.
  *
  * The filter bytes must be foldable (a literal): the sketch is
  * deserialized ONCE per executor (transient lazy), not per row.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects BINARY filter bytes, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter bytes must be foldable (a literal)")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a STRING value, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(left.eval(null).asInstanceOf[Array[Byte]])

  /** Probe with the UTF-8 bytes — the same bytes `BloomFilter.putString`
    * hashes on the build side, with no String materialization per row. */
  def mightContain(v: UTF8String): Boolean = filter.mightContainBinary(v.getBytes)

  override def nullSafeEval(bytes: Any, v: Any): Any =
    mightContain(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression so the generated code shares the one
    // lazily-deserialized sketch; the bytes literal costs a reference
    // lookup, never a per-row deserialize
    val self = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $self.mightContain($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
