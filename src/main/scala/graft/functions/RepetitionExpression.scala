package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Doc-local suffix automaton over the UTF-8 bytes: linear-time index of
  * every distinct substring of one document (Blumer et al. 1985 / the
  * standard online construction). Built per row inside an expression, so
  * the operator is pure map work — the 100 TB story is "each task scans
  * its rows, no state crosses rows", exactly like the other text
  * expressions.
  *
  * Two corpus-quality signals fall out of the one structure:
  *  - longest repeated substring (max len over states with >= 2 end
  *    positions): TEMPLATE/boilerplate spans and copy-paste loops inside a
  *    single document, at span granularity where bigram fractions
  *    (`bigram_repetition`) only see local stutter;
  *  - distinct-substring count (sum of len(v)-len(link(v))): normalized by
  *    n(n+1)/2 it is a duplication-free "substring entropy" — near 1 for
  *    natural text, collapsing toward 0 as content repeats.
  */
private[functions] object SuffixAutomaton {

  /** @return (longestRepeatedLen, distinctSubstrings) for the byte string */
  def repetitionStats(bytes: Array[Byte]): (Int, Long) = {
    val n = bytes.length
    if (n == 0) return (0, 0L)
    val maxStates = 2 * n + 4
    val len = new Array[Int](maxStates)
    val link = new Array[Int](maxStates)
    val isClone = new Array[Boolean](maxStates)
    // transition maps: per-state open-addressed byte->state would be
    // overkill; a HashMap per state keeps construction simple and the
    // automaton is discarded after the two folds below
    val next = new Array[java.util.HashMap[Integer, Integer]](maxStates)
    var size = 1
    var last = 0
    len(0) = 0; link(0) = -1; next(0) = new java.util.HashMap[Integer, Integer]()

    var i = 0
    while (i < n) {
      val c: Integer = bytes(i) & 0xff
      val cur = size; size += 1
      len(cur) = len(last) + 1
      link(cur) = -1
      next(cur) = new java.util.HashMap[Integer, Integer]()
      var p = last
      while (p >= 0 && !next(p).containsKey(c)) {
        next(p).put(c, cur)
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = next(p).get(c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          isClone(clone) = true
          next(clone) = new java.util.HashMap[Integer, Integer](next(q))
          while (p >= 0 && next(p).get(c) == q) {
            next(p).put(c, clone)
            p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }

    // distinct substrings: each state contributes its span of lengths
    var distinct = 0L
    var v = 1
    while (v < size) {
      distinct += len(v) - len(link(v))
      v += 1
    }

    // endpos sizes: originals seed 1, clones 0; propagate up the link tree
    // in decreasing-len order (counting sort by len, the standard trick)
    val cnt = new Array[Int](size)
    v = 1
    while (v < size) { if (!isClone(v)) cnt(v) = 1; v += 1 }
    val buckets = new Array[Int](n + 2)
    v = 0
    while (v < size) { buckets(len(v)) += 1; v += 1 }
    var b = 1
    while (b <= n) { buckets(b) += buckets(b - 1); b += 1 }
    val order = new Array[Int](size)
    v = 0
    while (v < size) { buckets(len(v)) -= 1; order(buckets(len(v))) = v; v += 1 }
    var longest = 0
    var oi = size - 1
    while (oi >= 1) {
      val s = order(oi)
      if (cnt(s) >= 2 && len(s) > longest) longest = len(s)
      cnt(link(s)) += cnt(s) // s >= 1 always has a parent (possibly root)
      oi -= 1
    }
    (longest, distinct)
  }
}

/** `repeated_span_stats(text)` -> STRUCT<longest_rep_len INT,
  * distinct_substrings BIGINT, distinct_ratio DOUBLE>. Byte-granular
  * (UTF-8): `longest_rep_len` counts bytes of the longest substring
  * occurring at least twice (overlaps allowed); `distinct_ratio` =
  * distinct_substrings / (n(n+1)/2), 1.0 for empty input.
  */
case class RepeatedSpanStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = RepeatedSpanStats.schema

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val (longest, distinct) = SuffixAutomaton.repetitionStats(bytes)
    val n = bytes.length.toLong
    val total = n * (n + 1) / 2
    val ratio = if (total == 0) 1.0 else distinct.toDouble / total.toDouble
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](longest, distinct, ratio))
  }

  override protected def withNewChildInternal(c: Expression): RepeatedSpanStats =
    copy(child = c)
  override def prettyName: String = "repeated_span_stats"
}

object RepeatedSpanStats {
  val schema: StructType = StructType(Seq(
    StructField("longest_rep_len", IntegerType, nullable = false),
    StructField("distinct_substrings", LongType, nullable = false),
    StructField("distinct_ratio", DoubleType, nullable = false)))
}
