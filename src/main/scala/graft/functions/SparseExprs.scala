package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ min(wa, wb) over the key-intersection of two SPARSE vectors given
  * as parallel (sorted-keys, weights) array pairs — the weighted-Jaccard
  * verification kernel. A two-pointer merge over the sorted key arrays
  * runs in O(|a| + |b|) per pair, entirely inside whole-stage codegen:
  * the alternative (per-pair posting-list join + hash re-aggregation)
  * shuffles |pairs|·|doc| rows, which at 10⁵+ candidate pairs is the
  * dominant stage cost (measured on q305: 2.5 s join+agg vs sub-second
  * merge). Keys are strings sorted in UTF8 binary order — exactly the
  * order `array_sort(collect_list(struct(term, tf)))` produces, and the
  * order UTF8String.compare implements, so the merge never misses.
  *
  * Nulls: any null input array yields NULL; elements are assumed
  * non-null (builders construct them from non-null groupBy keys).
  */
case class SparseMinSum(ka: Expression, wa: Expression,
                        kb: Expression, wb: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def first: Expression = ka
  override def second: Expression = wa
  override def third: Expression = kb
  override def fourth: Expression = wb
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(LongType),
      ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sparse_min_sum"
  override def nullable: Boolean =
    ka.nullable || wa.nullable || kb.nullable || wb.nullable

  override def nullSafeEval(a1: Any, a2: Any, a3: Any, a4: Any): Any = {
    val k1 = a1.asInstanceOf[ArrayData]; val v1 = a2.asInstanceOf[ArrayData]
    val k2 = a3.asInstanceOf[ArrayData]; val v2 = a4.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var s = 0L
    val n1 = k1.numElements(); val n2 = k2.numElements()
    while (i < n1 && j < n2) {
      val c = k1.getUTF8String(i).compareTo(k2.getUTF8String(j))
      if (c == 0) {
        s += math.min(v1.getLong(i), v2.getLong(j)); i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k1, v1, k2, v2) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $k1.numElements() && $j < $k2.numElements()) {
         |  int $c = $k1.getUTF8String($i).compareTo($k2.getUTF8String($j));
         |  if ($c == 0) {
         |    $s += Math.min($v1.getLong($i), $v2.getLong($j));
         |    $i++; $j++;
         |  } else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): Expression =
    copy(ka = first, wa = second, kb = third, wb = fourth)
}

/** [[SparseMinSum]] over 64-bit-hashed keys (the q61/q326 fixed-width
  * convention): same two-pointer merge, but the key compare is a single
  * long compare instead of a UTF8 byte scan — and everything upstream
  * (shuffles, join keys, sort order) moves to fixed-width longs too.
  * Keys sorted ascending as signed longs — exactly the order
  * `array_sort` produces for LongType. */
case class SparseMinSumLong(ka: Expression, wa: Expression,
                            kb: Expression, wb: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def first: Expression = ka
  override def second: Expression = wa
  override def third: Expression = kb
  override def fourth: Expression = wb
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType),
      ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sparse_min_sum_long"
  override def nullable: Boolean =
    ka.nullable || wa.nullable || kb.nullable || wb.nullable

  override def nullSafeEval(a1: Any, a2: Any, a3: Any, a4: Any): Any = {
    val k1 = a1.asInstanceOf[ArrayData]; val v1 = a2.asInstanceOf[ArrayData]
    val k2 = a3.asInstanceOf[ArrayData]; val v2 = a4.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var s = 0L
    val n1 = k1.numElements(); val n2 = k2.numElements()
    while (i < n1 && j < n2) {
      val x = k1.getLong(i); val y = k2.getLong(j)
      if (x == y) {
        s += math.min(v1.getLong(i), v2.getLong(j)); i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k1, v1, k2, v2) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $k1.numElements() && $j < $k2.numElements()) {
         |  long $x = $k1.getLong($i); long $y = $k2.getLong($j);
         |  if ($x == $y) {
         |    $s += Math.min($v1.getLong($i), $v2.getLong($j));
         |    $i++; $j++;
         |  } else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): Expression =
    copy(ka = first, wa = second, kb = third, wb = fourth)
}

/** Sparse integer DOT PRODUCT over 64-bit-hashed keys: the cosine
  * verify kernel (q331) — same two-pointer merge as [[SparseMinSumLong]]
  * but summing products of the matched weights. Keys sorted ascending
  * as signed longs (the `array_sort` LongType order). Products and the
  * running sum stay in Long — callers quantize weights so Σw² (hence
  * any dot) fits 2⁶³, the q266 contract. */
case class SparseDotLong(ka: Expression, wa: Expression,
                         kb: Expression, wb: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def first: Expression = ka
  override def second: Expression = wa
  override def third: Expression = kb
  override def fourth: Expression = wb
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType),
      ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sparse_dot_long"
  override def nullable: Boolean =
    ka.nullable || wa.nullable || kb.nullable || wb.nullable

  override def nullSafeEval(a1: Any, a2: Any, a3: Any, a4: Any): Any = {
    val k1 = a1.asInstanceOf[ArrayData]; val v1 = a2.asInstanceOf[ArrayData]
    val k2 = a3.asInstanceOf[ArrayData]; val v2 = a4.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var s = 0L
    val n1 = k1.numElements(); val n2 = k2.numElements()
    while (i < n1 && j < n2) {
      val x = k1.getLong(i); val y = k2.getLong(j)
      if (x == y) {
        s += v1.getLong(i) * v2.getLong(j); i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k1, v1, k2, v2) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $k1.numElements() && $j < $k2.numElements()) {
         |  long $x = $k1.getLong($i); long $y = $k2.getLong($j);
         |  if ($x == $y) {
         |    $s += $v1.getLong($i) * $v2.getLong($j);
         |    $i++; $j++;
         |  } else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): Expression =
    copy(ka = first, wa = second, kb = third, wb = fourth)
}

/** |a ∩ b| of two SORTED long arrays (distinct-element sets) — the
  * set-intersection kernel behind the exact-Jaccard calibration truth
  * (q334/q335): the same two-pointer merge as [[SparseMinSumLong]] with
  * the weights dropped. `size(array_intersect(a, b))` allocates a hash
  * set AND a result array per pair; at ~10⁶ truth pairs that per-pair
  * allocation is the dominant stage cost, while this merge is
  * allocation-free inside whole-stage codegen. Both inputs must be
  * sorted ascending as signed longs (the `array_sort` LongType order)
  * and duplicate-free — callers build them with
  * `array_sort(array_distinct(...))` once per DOC, not per pair. */
case class SortedIntersectCountLong(ka: Expression, kb: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def left: Expression = ka
  override def right: Expression = kb
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"
  override def nullable: Boolean = ka.nullable || kb.nullable

  override def nullSafeEval(a1: Any, a2: Any): Any = {
    val k1 = a1.asInstanceOf[ArrayData]; val k2 = a2.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var s = 0L
    val n1 = k1.numElements(); val n2 = k2.numElements()
    while (i < n1 && j < n2) {
      val x = k1.getLong(i); val y = k2.getLong(j)
      if (x == y) { s += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k1, k2) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $k1.numElements() && $j < $k2.numElements()) {
         |  long $x = $k1.getLong($i); long $y = $k2.getLong($j);
         |  if ($x == $y) { $s++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(ka = newLeft, kb = newRight)
}

object SparseExprs {
  def sparseMinSum(ka: Column, wa: Column, kb: Column, wb: Column): Column =
    ExpressionUtils.column(SparseMinSum(
      ExpressionUtils.expression(ka), ExpressionUtils.expression(wa),
      ExpressionUtils.expression(kb), ExpressionUtils.expression(wb)))
  def sparseMinSumLong(ka: Column, wa: Column, kb: Column, wb: Column): Column =
    ExpressionUtils.column(SparseMinSumLong(
      ExpressionUtils.expression(ka), ExpressionUtils.expression(wa),
      ExpressionUtils.expression(kb), ExpressionUtils.expression(wb)))
  def sparseDotLong(ka: Column, wa: Column, kb: Column, wb: Column): Column =
    ExpressionUtils.column(SparseDotLong(
      ExpressionUtils.expression(ka), ExpressionUtils.expression(wa),
      ExpressionUtils.expression(kb), ExpressionUtils.expression(wb)))
  def sortedIntersectCountLong(ka: Column, kb: Column): Column =
    ExpressionUtils.column(SortedIntersectCountLong(
      ExpressionUtils.expression(ka), ExpressionUtils.expression(kb)))
}
