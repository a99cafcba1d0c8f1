package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Native Catalyst Morton (Z-order) bit interleave.
  *
  * The composable form ([[graft.Layout.zorderSql]]'s shape as a Column
  * fold) unrolls into 2·bits shift/mask terms — correct and codegen'd,
  * but the expression tree alone is ~60 nodes at 8 bits. A table write
  * that Z-orders its layout evaluates the key once per ROW of a 100 TB
  * table, so this is worth one tight generated loop: `doGenCode` emits a
  * primitive `long` for-loop inside the surrounding stage.
  *
  * Semantics (identical to the SQL twin, bit-for-bit): both inputs are
  * masked to the low `bits` bits, bit i of x lands at position 2i, bit i
  * of y at 2i+1. Pure integer arithmetic — nothing to round, nothing
  * order-dependent.
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def mask: Long = (1L << bits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long] & mask
    val y = b.asInstanceOf[Long] & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutExprs {
  /** Column-level Z-order key backed by the codegen expression. */
  def zorder(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(MortonInterleave(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))
}
