package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass 60-bit SimHash signature over a text column.
  *
  * Same narrow-loop rationale as [[MinhashSig]]: the explode + 60-sum-
  * column aggregation pipeline pays an explode and a shuffle per
  * signature; this computes the identical value — every token occurrence
  * votes ±1 per bit of its md5-hex-prefix 60-bit hash, signature bit set
  * iff the vote sum is positive — in one pass per document. Bit-equality
  * with the aggregation pipeline is pinned in the unit suite. */
case class SimhashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"

  override def nullSafeEval(t: Any): Any =
    SimhashUtil.sig(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.SimhashUtil.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashUtil {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Called from generated code. split(" ", -1) semantics: empty tokens
    * (consecutive/trailing spaces, empty doc) vote like any other token —
    * exactly as the explode pipeline hashes them. */
  def sig(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](60)
    val md = tlMd.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars == top 60 bits of the digest (hash60 bit-exact)
      val x = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >> 4)
      var j = 0
      while (j < 60) {
        votes(j) += (if (((x >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

object SimhashExprs {
  def signature(text: Column): Column =
    ExpressionUtils.column(SimhashSig(ExpressionUtils.expression(text)))
}
