package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-hash document fingerprint over a token array.
  *
  * Replaces the `aggregate(tokens, 0L, (acc, t) => pmod(acc*31 + tokVal(t),
  * 1e9+7))` composition: higher-order Catalyst lambdas run interpreted (one
  * boxed closure call per token, two `substr` allocations inside), which
  * made the fingerprint the hottest text operator. This expression folds
  * the same recurrence in one primitive loop that whole-stage codegen
  * inlines into the surrounding stage.
  *
  * Semantics (pinned against the composition in the unit suite, identical
  * to the DuckDB oracle spelling): token value = cp(first char)*17161 +
  * cp(last char)*131 + numChars, with cp = code point (DuckDB `ascii`);
  * empty token contributes 0; fold is left-to-right, acc mod 1_000_000_007.
  */
case class Fingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(a: Any): Any =
    FingerprintUtil.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"org.apache.spark.sql.graft.FingerprintUtil.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintUtil {
  private val Mod = 1000000007L

  private def codePoint(oneChar: UTF8String): Int = {
    if (oneChar.numBytes == 0) return 0
    val b = oneChar.getByte(0)
    if (b >= 0) b.toInt else oneChar.toString.codePointAt(0)
  }

  /** Called from generated code (static forwarder of this object). */
  def compute(arr: ArrayData): Long = {
    var acc = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // Null elements are treated as empty tokens (contribute 0). This
      // diverges from the lambda form (which nulls the whole fold) but is
      // unreachable from tokenization: split() never emits null elements.
      if (s == null) { acc = (acc * 31L) % Mod; i += 1 }
      else {
        val nc = s.numChars()
        val v =
          if (nc == 0) 0L
          else codePoint(s.substring(0, 1)) * 17161L +
            codePoint(s.substring(nc - 1, nc)) * 131L + nc
        acc = (acc * 31L + v) % Mod
        i += 1
      }
    }
    acc
  }
}

/** Native max-occurrence count over a string array: sort + one-pass max
  * run length (equal to the max per-distinct-element count).
  *
  * Replaces the `aggregate(array_sort(arr), struct-state fold)` composition
  * in the Gopher repetition rules: higher-order Catalyst lambdas run
  * interpreted, allocating a struct row per element; this expression does
  * the same O(n log n) work in one primitive loop that whole-stage codegen
  * inlines. Semantics pinned against the composition in the unit suite.
  * Null elements sort together and count as a run of equals (unreachable
  * from tokenization — split() never emits nulls). Empty array → 0.
  */
case class MaxRunCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_run_count"

  override def nullSafeEval(a: Any): Any =
    MaxRunCountUtil.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"org.apache.spark.sql.graft.MaxRunCountUtil.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxRunCountUtil {
  /** Called from generated code (static forwarder of this object). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val a = new Array[UTF8String](n)
    var i = 0
    // isNullAt guard: for UnsafeArrayData a null element is NOT guaranteed
    // to come back as null from getUTF8String (it can read as empty), so
    // the documented nulls-sort-together semantics need the explicit check.
    while (i < n) { a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    // nulls first, then UTF8String binary order (comparator only needs a
    // consistent total order — any order groups equals adjacently)
    java.util.Arrays.sort(a, (x: UTF8String, y: UTF8String) =>
      if (x eq y) 0
      else if (x == null) -1
      else if (y == null) 1
      else x.compareTo(y))
    var best = 1L
    var run = 1L
    i = 1
    while (i < n) {
      val eq = if (a(i) == null) a(i - 1) == null
               else a(i - 1) != null && a(i).equals(a(i - 1))
      run = if (eq) run + 1 else 1L
      if (run > best) best = run
      i += 1
    }
    best
  }
}

/** Native Shannon entropy (log base 2) of the element distribution of a
  * string array — the vocabulary-diversity quality signal (low-entropy
  * documents are boilerplate/repetition; cf. the Gopher repetition family).
  *
  * One sort + one run-length pass per row, inlined by whole-stage codegen —
  * no hash map, no explode-then-groupBy row blowup (the naive Spark
  * spelling shuffles one row PER TOKEN; this keeps one row per document).
  * Matches DuckDB's `entropy()` aggregate over the unnested tokens:
  * H = log2(n) − (Σ c·log2(c)) / n over per-distinct counts c. The
  * per-run terms are accumulated in sorted-token order (deterministic
  * across runs; cross-engine agreement is sealed by round(,4) at the
  * query layer). Empty array → 0.0; null elements group as one token
  * (unreachable from tokenization — split() never emits nulls).
  */
case class TokenEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_token_entropy"

  override def nullSafeEval(a: Any): Any =
    TokenEntropyUtil.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"org.apache.spark.sql.graft.TokenEntropyUtil.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenEntropyUtil {
  private val Log2 = math.log(2.0)

  /** Called from generated code (static forwarder of this object). */
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) { a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(a, (x: UTF8String, y: UTF8String) =>
      if (x eq y) 0
      else if (x == null) -1
      else if (y == null) 1
      else x.compareTo(y))
    // Σ c·log2(c) over run lengths of the sorted array
    var sumClogC = 0.0
    var run = 1L
    i = 1
    while (i < n) {
      val eq = if (a(i) == null) a(i - 1) == null
               else a(i - 1) != null && a(i).equals(a(i - 1))
      if (eq) run += 1
      else { if (run > 1) sumClogC += run * (math.log(run.toDouble) / Log2); run = 1L }
      i += 1
    }
    if (run > 1) sumClogC += run * (math.log(run.toDouble) / Log2)
    math.log(n.toDouble) / Log2 - sumClogC / n
  }
}

object TextExprs {
  /** Column-level fingerprint backed by the codegen expression. */
  def fingerprint(tokens: Column): Column =
    ExpressionUtils.column(Fingerprint(ExpressionUtils.expression(tokens)))

  /** Column-level max-run count backed by the codegen expression. */
  def maxRunCount(arr: Column): Column =
    ExpressionUtils.column(MaxRunCount(ExpressionUtils.expression(arr)))

  /** Column-level token entropy backed by the codegen expression. */
  def tokenEntropy(arr: Column): Column =
    ExpressionUtils.column(TokenEntropy(ExpressionUtils.expression(arr)))
}
