package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass language-ID and quality-score expressions.
  *
  * The composable Column trees ([[graft.TextAnalysis.langIdCols]] /
  * [[graft.TextAnalysis.qualityScoreCols]]) build `split(text, ' ')` and
  * `array_distinct` once PER REFERENCE — and the language/quality gate
  * (`langId === "en" && qualityScore >= 0.5`) references them ~20×
  * inside one Filter, where Spark applies no subexpression elimination
  * (FilterExec generates the predicate without CSE). Measured r13: the
  * gate over sf0.1 documents cost 0.81 s in its (single-task) scan
  * stage — ~160 µs/doc of repeated tokenize+distinct work. These
  * expressions compute the identical values in one narrow loop per
  * document (tokenize once, one distinct set, one stopword-hit count
  * per language): ~30× less per-row work, at ANY scale — the per-task
  * half of the optimization guide (§1.2 step 2), same device as
  * [[MinhashSig]]/[[SimhashSig]]. Bit-equality with the Column trees is
  * pinned in the unit suite (TextGateParitySpec).
  */
object TextGateUtil {
  /** Mirror of [[graft.TextAnalysis.Stopwords]] — kept in lockstep by the
    * parity pin (the test compares against the Column trees built FROM
    * TextAnalysis.Stopwords, so a drift here fails the suite). */
  private val stopwords: Array[(String, Array[String])] = Array(
    "de" -> Array("der", "die", "das", "und", "ist", "von", "mit", "für", "ein", "zu"),
    "en" -> Array("the", "and", "of", "to", "a", "in", "is", "that", "with", "for"),
    "es" -> Array("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Array("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "avec"),
    "zh" -> Array("的", "是", "在", "了", "和", "有", "我", "不", "这", "也"))

  private val langSets: Array[(UTF8String, java.util.HashSet[UTF8String])] =
    stopwords.map { case (lang, ws) =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      (UTF8String.fromString(lang), s)
    }

  private val allStop: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.flatMap(_._2).foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** The no-hit sentinel. ALSO the null-input result: the Column tree's
    * `when(score > 0, lang).otherwise("und")` sends a null text through
    * the otherwise branch, so langId is never null — mirrored here. */
  val und: UTF8String = UTF8String.fromString("und")
  private val space = UTF8String.fromString(" ")

  /** Distinct tokens of `split(text, " ", -1)`, as UTF8String (byte-wise
    * equality — exactly array_distinct's comparison). */
  private def distinctToks(text: UTF8String): java.util.HashSet[UTF8String] = {
    val toks = text.split(space, -1)
    val set = new java.util.HashSet[UTF8String](math.max(16, toks.length * 2))
    var i = 0
    while (i < toks.length) { set.add(toks(i)); i += 1 }
    set
  }

  /** == TextAnalysis.langIdCols: per-language stopword hit-rate over
    * distinct tokens; argmax with ties to the lexically greatest lang
    * (array_max over struct(score, lang)); "und" when no hits. */
  def langId(text: UTF8String): UTF8String = {
    val set = distinctToks(text)
    val nd = set.size.toDouble
    var bestScore = Double.NegativeInfinity
    var bestLang: UTF8String = null
    var li = 0
    while (li < langSets.length) {
      val (lang, words) = langSets(li)
      var hits = 0
      val it = words.iterator()
      while (it.hasNext) { if (set.contains(it.next())) hits += 1 }
      val score = hits.toDouble / nd
      // ascending lang order: >= keeps the lexically greatest on ties,
      // matching array_max's struct comparison
      if (score >= bestScore) { bestScore = score; bestLang = lang }
      li += 1
    }
    if (bestScore > 0d) bestLang else und
  }

  /** The Column tree's value for NULL text — NOT null: `least` skips
    * null arguments (lenOk = least(null, 1) = 1, ttr/stop terms = 1)
    * and the tokLenOk `when` falls to its otherwise (0.5), so
    * quality(null) = 1·0.3 + 0.5·0.2 + 1·0.3 + 1·0.2 = 0.8999…99
    * in the tree's association order. Pinned in TextGateParitySpec. */
  val nullQuality: Double = 1d * 0.3 + 0.5 * 0.2 + 1d * 0.3 + 1d * 0.2

  /** == TextAnalysis.qualityScoreCols: length band, mean-token-length
    * band, type-token ratio, stopword presence — same double-arithmetic
    * association order as the Column tree (bit-exact). */
  def qualityScore(text: UTF8String): Double = {
    val toks = text.split(space, -1)
    val nTok = toks.length.toDouble
    val nChar = text.numChars().toDouble
    val meanTokLen = (nChar - (nTok - 1d)) / nTok
    val set = new java.util.HashSet[UTF8String](math.max(16, toks.length * 2))
    var i = 0
    while (i < toks.length) { set.add(toks(i)); i += 1 }
    val nd = set.size.toDouble
    var stopHits = 0
    val it = set.iterator()
    while (it.hasNext) { if (allStop.contains(it.next())) stopHits += 1 }
    val ttr = nd / nTok
    val stopRatio = stopHits.toDouble / nd
    val lenOk = if (nTok >= 10d && nTok <= 1000d) 1d else math.min(nTok / 10d, 1d)
    val tokLenOk = if (meanTokLen >= 2d && meanTokLen <= 12d) 1d else 0.5d
    lenOk * 0.3 + tokLenOk * 0.2 + math.min(ttr * 2d, 1d) * 0.3 +
      math.min(stopRatio * 5d, 1d) * 0.2
  }
}

case class LangIdSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"
  // never null: a null text routes through the composable tree's
  // otherwise-branch to "und" (pinned in TextGateParitySpec)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextGateUtil.und
    else TextGateUtil.langId(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val u = "org.apache.spark.sql.graft.TextGateUtil"
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = ${c.isNull} ? $u.und() : $u.langId(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class QualityScoreSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_score"
  // never null: the Column tree's `least` skips nulls, so a null text
  // scores nullQuality (pinned in TextGateParitySpec)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextGateUtil.nullQuality
    else TextGateUtil.qualityScore(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val u = "org.apache.spark.sql.graft.TextGateUtil"
    ev.copy(
      code = code"""
        ${c.code}
        double ${ev.value} = ${c.isNull} ? $u.nullQuality() : $u.qualityScore(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextGateExprs {
  def langId(text: Column): Column =
    ExpressionUtils.column(LangIdSig(ExpressionUtils.expression(text)))
  def qualityScore(text: Column): Column =
    ExpressionUtils.column(QualityScoreSig(ExpressionUtils.expression(text)))
}
