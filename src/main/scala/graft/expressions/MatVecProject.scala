package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `mat_vec_project(vec, mat, center)` — dense matrix–vector projection
  * inside whole-stage codegen: `out[k] = Σ_i (vec[i] − center[i]) ·
  * mat[k·d + i]`, with `d = |center|` and `m = |mat| / d` (mat is the
  * row-major flattening of an m×d matrix).
  *
  * This is the embedding-compression primitive (PCA transform, random
  * projection, any learned linear map): `mat`/`center` arrive as
  * broadcast-sized literal arrays (the model is O(m·d) — driver state the
  * same way a k-means centroid table is), and each row costs one fused
  * loop — no per-row lambda frames, no intermediate arrays, unlike the
  * `transform`/`aggregate` higher-order-function spelling.
  *
  * Accumulation is sequential in `i` (ascending), so results are
  * bit-reproducible across partitionings and mirror-able by any engine
  * that folds a list in order. NULL vec → NULL; `|vec| ≠ d` or
  * `|mat| % d ≠ 0` → runtime IllegalArgumentException (a model/data
  * dimension mismatch is a bug, not data).
  */
case class MatVecProject(vec: Expression, mat: Expression, center: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (Seq(vec, mat, center).forall(e => ok(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "mat_vec_project expects three ARRAY<DOUBLE> arguments, got " +
        Seq(vec, mat, center).map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean =
    vec.nullable || mat.nullable || center.nullable
  override def prettyName: String = "mat_vec_project"

  override def first: Expression = vec
  override def second: Expression = mat
  override def third: Expression = center

  override def nullSafeEval(v: Any, m: Any, c: Any): Any = {
    val va = v.asInstanceOf[ArrayData]
    val ma = m.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val d = ca.numElements()
    require(va.numElements() == d && d > 0 && ma.numElements() % d == 0,
      s"mat_vec_project: dim mismatch |vec|=${va.numElements()} " +
        s"|center|=$d |mat|=${ma.numElements()}")
    val rows = ma.numElements() / d
    val out = new Array[Double](rows)
    var k = 0
    while (k < rows) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += (va.getDouble(i) - ca.getDouble(i)) * ma.getDouble(k * d + i)
        i += 1
      }
      out(k) = acc
      k += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, c) => {
      val arrCls = classOf[GenericArrayData].getName
      // fresh names: this code inlines into surrounding codegen that may
      // already bind i/k/d (e.g. a transform() lambda on the same column)
      val d = ctx.freshName("d")
      val rows = ctx.freshName("rows")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $d = $c.numElements();
         |if ($v.numElements() != $d || $d == 0 || $m.numElements() % $d != 0) {
         |  throw new IllegalArgumentException("mat_vec_project: dim mismatch |vec|="
         |    + $v.numElements() + " |center|=" + $d + " |mat|=" + $m.numElements());
         |}
         |int $rows = $m.numElements() / $d;
         |double[] $out = new double[$rows];
         |for (int $k = 0; $k < $rows; $k++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += ($v.getDouble($i) - $c.getDouble($i)) * $m.getDouble($k * $d + $i);
         |  }
         |  $out[$k] = $acc;
         |}
         |${ev.value} = new $arrCls($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, mat = newSecond, center = newThird)
}
