package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — runs
  * through interpreted higher-order lambdas (no whole-stage codegen, one
  * boxed function call per element). Vector similarity evaluates the dot
  * product once per candidate PAIR, so at 100 TB this is the hottest loop
  * in the engine; `doGenCode` emits a primitive `double` loop that stays
  * inside the generated code of the surrounding join/projection stage.
  *
  * Semantics match the aggregate(zip_with) composition exactly, including
  * on malformed input: unequal-length arrays and null elements both yield
  * NULL (zip_with pads the shorter side with null, the product is null, and
  * a null term nulls the whole sum). Summation order is ascending index,
  * exactly like the aggregate() form and DuckDB's
  * `list_cosine_similarity`, so oracle values stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // Nullable even over non-null children: length mismatch / null elements
  // produce NULL.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-level dot product backed by the codegen expression. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-level integral divide (`a div b`) — the building block of
    * graft.Seal's name-free integer-rounding form. Lives here because
    * ExpressionUtils is package-private to org.apache.spark.sql. */
  def idiv(a: Column, b: Column): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
