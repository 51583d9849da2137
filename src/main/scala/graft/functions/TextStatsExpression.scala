package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared stopword profiles for the language-ID / quality heuristics.
  * Must stay in sync with the documented semantics in
  * [[graft.operators.TextAnalysis]] (the builtin-composed reference path).
  */
object TextStatsProfiles {
  val langs: Array[String] = Array("en", "fr", "es", "de")
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "que", "est", "dans", "pour", "qui", "pas"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por", "con", "para", "su"),
    "de" -> Seq("der", "die", "das", "und", "in", "von", "zu", "mit", "ist", "den", "nicht", "ein", "eine", "auf", "als"))

  private[functions] val sets: Array[java.util.HashSet[String]] = langs.map { l =>
    val s = new java.util.HashSet[String]()
    stopwords(l).foreach(s.add)
    s
  }
  private[functions] val allSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.values.flatten.foreach(s.add)
    s
  }
}

/** `text_stats(text)` -> struct of the character/word/stopword statistics the
  * quality-scoring and language-ID heuristics need, computed in ONE pass over
  * the string instead of ~10 separate regex/higher-order-function passes
  * (Spark's array `filter`/`transform` lambdas are CodegenFallback and
  * dominate the cost of the builtin-composed formulation; measured ~10x on
  * the documents table).
  *
  * Semantics (must match the builtin path in `TextAnalysis` exactly):
  *  - n_chars  = `length(text)` (Unicode code points)
  *  - words    = runs of `\p{L}` in `lower(text)` (split on non-letter runs)
  *  - n_alpha  = count of `\p{L}` code points in the original text
  *  - n_punct  = count of `\p{Punct}` (ASCII punctuation, Java regex class)
  *  - n_cjk    = count of chars in [一-鿿぀-ヿ]
  *  - stop_<l> = occurrences (with duplicates) of words in lang l's profile
  *  - stop_all = occurrences of words in the union of all profiles
  */
case class TextStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = TextStats.schema

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var nChars = 0
    var nAlpha = 0
    var nPunct = 0
    var nCjk = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (Character.isLetter(cp)) nAlpha += 1
      // \p{Punct}: ASCII punctuation per the Java regex POSIX class
      if (cp < 128 && TextStats.asciiPunct(cp)) nPunct += 1
      if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3040 && cp <= 0x30ff)) nCjk += 1
      i += Character.charCount(cp)
    }
    // word pass over the lowered text (same mapping as the builtin `lower`)
    val lowered = v.asInstanceOf[UTF8String].toLowerCase.toString
    var nWords = 0
    val stopHits = new Array[Int](TextStatsProfiles.langs.length)
    var stopAll = 0
    var start = -1
    var j = 0
    val n = lowered.length
    while (j <= n) {
      val isLetter = j < n && {
        val cp = lowered.codePointAt(j)
        Character.isLetter(cp)
      }
      if (isLetter && start < 0) start = j
      else if (!isLetter && start >= 0) {
        nWords += 1
        val w = lowered.substring(start, j)
        var l = 0
        while (l < TextStatsProfiles.sets.length) {
          if (TextStatsProfiles.sets(l).contains(w)) stopHits(l) += 1
          l += 1
        }
        if (TextStatsProfiles.allSet.contains(w)) stopAll += 1
        start = -1
      }
      if (j < n) j += Character.charCount(lowered.codePointAt(j)) else j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nWords, nAlpha, nPunct, nCjk,
        stopHits(0), stopHits(1), stopHits(2), stopHits(3), stopAll))
  }

  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
  override def prettyName: String = "text_stats"
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_cjk", IntegerType, nullable = false),
    StructField("stop_en", IntegerType, nullable = false),
    StructField("stop_fr", IntegerType, nullable = false),
    StructField("stop_es", IntegerType, nullable = false),
    StructField("stop_de", IntegerType, nullable = false),
    StructField("stop_all", IntegerType, nullable = false)))

  private val punctChars = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
  private[functions] val asciiPunct: Array[Boolean] = {
    val a = new Array[Boolean](128)
    punctChars.foreach(c => a(c) = true)
    a
  }
}

/** `bigram_repetition(text)` -> struct: intra-document repetition signals in
  * one pass — the Gopher/RefinedWeb-style filters that catch boilerplate and
  * degenerate (looping) generations before they reach a training mix:
  *  - n_bigrams        = total word-bigram occurrences (n_words - 1, >= 0)
  *  - top_bigram_frac  = occurrences of the single most frequent bigram /
  *                       n_bigrams (1.0 for a document that repeats one
  *                       phrase forever; ~1/n for natural text)
  *  - dup_bigram_frac  = occurrences of bigrams seen more than once /
  *                       n_bigrams (repetition mass, counted WITH
  *                       multiplicity)
  * Words are [[TextSketching.tokenize]] (lowercase, split on non-letter
  * runs) — the same tokenization the shingle/jaccard family and its DuckDB
  * oracles use. Bigrams are counted by 64-bit FNV-1a hash; a collision would
  * merge two bigram counts (~n^2/2^65 — the same accepted trade as the
  * hashed-shingle jaccard). Both fractions are 0.0 when the document has
  * fewer than two words.
  */
case class BigramRepetition(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = BigramRepetition.schema

  override def nullSafeEval(v: Any): Any = {
    val ws = TextSketching.tokenize(v.asInstanceOf[UTF8String].toString)
    val n = math.max(ws.length - 1, 0)
    if (n == 0) {
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0.0, 0.0))
    }
    val counts = new java.util.HashMap[java.lang.Long, Int](n * 2)
    var i = 0
    while (i < n) {
      val h = java.lang.Long.valueOf(
        TextSketching.fnv1a64(ws(i) + " " + ws(i + 1)))
      counts.merge(h, 1, (a, b) => a + b)
      i += 1
    }
    var top = 0
    var dup = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, top.toDouble / n, dup.toDouble / n))
  }

  override protected def withNewChildInternal(c: Expression): BigramRepetition = copy(child = c)
  override def prettyName: String = "bigram_repetition"
}

object BigramRepetition {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = false)))
}
