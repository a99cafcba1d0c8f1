package graft

import org.apache.spark.sql.functions._

/** Bit-equality pin: the native single-pass language-ID / quality-score
  * expressions (LangIdSig / QualityScoreSig — the r13 optimization of
  * the prep-front gate) against the composable Column trees they
  * replaced. Any drift in tokenization, distinct semantics, tie-breaks,
  * stopword lists, or double-arithmetic association order fails here
  * before it can silently change a gated query's output. */
class TextGateParitySpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",                                   // split("", -1) = [""]
    " ",                                  // leading/trailing empties
    "  ",
    "the",                                // single en stopword
    "el la de",                           // es
    "le la de",                           // fr/es tie territory
    "der die das und ist",                // de
    "的 是 在",                            // zh (multi-byte)
    "x",                                  // no stopword at all -> und
    "the the the the the",                // repeated token, ttr = 1/5
    "für zu",                             // non-ASCII de stopword
    ("tok " * 1500).trim,                 // nTok > 1000 length band
    "a b c d e f g h i j k l m n o p",   // ttr = 1
    "the  and",                           // double space -> empty token
    "The AND of",                         // case-sensitive: only 'of' hits
    "word\tthe",                          // tab is not a split char
    "é ü ñ the"                           // non-ASCII non-stopwords
  )

  test("native langId/qualityScore == composable Column trees " +
       "(fixture corpus + adversarial strings, exact doubles)") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("text"))
      .unionByName(adversarial.toDF("text"))
    val cmp = docs.select(
      TextAnalysis.langId(col("text")).as("ln"),
      TextAnalysis.langIdCols(col("text")).as("lc"),
      TextAnalysis.qualityScore(col("text")).as("qn"),
      TextAnalysis.qualityScoreCols(col("text")).as("qc"),
      col("text"))
    val bad = cmp.where(!(col("ln") <=> col("lc")) ||
      !(col("qn") <=> col("qc"))).collect()
    assert(bad.isEmpty, s"native/composable gate drift on: ${bad.take(5).mkString("; ")}")
    // exact double equality (not tolerance): the quality blend must be
    // bit-identical or round(q, 4) could flip a gate at the boundary
    rows(cmp.select("qn", "qc")).foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"quality bits drift: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("null text: langId = 'und', quality = the least-skips-nulls 0.9 " +
       "(native == composable under the ANSI-on runtime config)") {
    // The composable tree's null-text value is CONFIG-SENSITIVE:
    // with ansi off, size(null) = -1 makes every language score
    // (-1)/(-1) = 1 and langIdCols(null) = "zh". The driver's
    // Verify/Bench sessions run Spark 4's default (ansi ON), where
    // size(null) = null -> "und" / 0.9 — that is the semantics the
    // native expression mirrors (no fixture text is null, so no
    // declared query observes the difference either way).
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = Seq[Option[String]](None, Some("the and")).toDF("text")
      val r = rows(df.select(
        TextAnalysis.langId(col("text")).as("ln"),
        TextAnalysis.langIdCols(col("text")).as("lc"),
        TextAnalysis.qualityScore(col("text")).as("qn"),
        TextAnalysis.qualityScoreCols(col("text")).as("qc")))
      assert(r(0).getString(0) == "und" && r(0).getString(1) == "und")
      assert(!r(0).isNullAt(2) && !r(0).isNullAt(3) &&
        java.lang.Double.doubleToRawLongBits(r(0).getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(r(0).getDouble(3)))
      assert(r(1).getString(0) == "en" && r(1).getString(1) == "en")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
