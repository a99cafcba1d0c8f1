package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass MinHash signature over a text column.
  *
  * The composable pipeline (explode shingles → md5 → groupBy with numPerm
  * min() columns) is shaped right for re-aggregation but pays an explode
  * and a shuffle per signature build. This expression computes the
  * identical signature — same whitespace tokenization, same k-token
  * shingles, same md5-hex-prefix 28-bit hash, same (a·x+b) mod p minima —
  * in ONE narrow loop per document: no explode, no shuffle, md5 exactly
  * once per shingle. Bit-equality with the aggregation pipeline is pinned
  * in the unit suite.
  *
  * Returns NULL for documents with fewer than `shingleSize` tokens
  * (mirror of the pipeline dropping docs with no shingles).
  */
case class MinhashSig(child: Expression, shingleSize: Int, numPerm: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleSize > 0 && numPerm > 0, "shingleSize and numPerm must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(t: Any): Any =
    MinhashUtil.sig(t.asInstanceOf[UTF8String], shingleSize, numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.MinhashUtil.sig($c, $shingleSize, $numPerm);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashUtil {
  /** Same modulus/affine family as graft.Dedup.{MinhashPrime, minhashParams}. */
  val Prime: Long = 2147483647L
  // cached per numPerm: this runs once per ROW in the hot loop — fresh
  // coefficient arrays per invocation would be pure allocator pressure
  private val paramsCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def paramsFor(numPerm: Int): (Array[Long], Array[Long]) =
    paramsCache.computeIfAbsent(numPerm, np => (
      Array.tabulate(np)(i => 2L * (i + 1) + 1L),
      Array.tabulate(np)(i => 7919L * (i + 1))))

  private val tlMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from generated code. Null when the doc has < shingleSize tokens. */
  def sig(text: UTF8String, shingleSize: Int, numPerm: Int): GenericArrayData = {
    // exact Spark split(text, " ") semantics: limit -1 keeps trailing empties
    val toks = text.toString.split(" ", -1)
    if (toks.length < shingleSize) return null
    val (as, bs) = paramsFor(numPerm)
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val md = tlMd.get()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - shingleSize) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 7 hex chars of the digest == top 28 bits (hash28 bit-exact)
      val x = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
      var p = 0
      while (p < numPerm) {
        val v = (as(p) * x + bs(p)) % Prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinhashExprs {
  def signature(text: Column, shingleSize: Int, numPerm: Int): Column =
    ExpressionUtils.column(MinhashSig(
      ExpressionUtils.expression(text), shingleSize, numPerm))
}
