package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding — THE
  * training-data-pipeline operation (Sennrich et al. 2016): learn a merge
  * table from the corpus, then tokenize everything with it.
  *
  * Scale design (100 TB): BPE training never needs the corpus — it needs
  * the WORD-FREQUENCY TABLE. One distributed pass folds the corpus to
  * (word, count) at vocab grain (a few hundred thousand rows regardless of
  * corpus size); the merge iterations then run on a bounded top-`maxWords`
  * slice of that table on the driver with incremental pair-count updates —
  * the same fit-on-bounded-sample / apply-distributed split the ANN
  * centroids use, and exactly how production tokenizer trainers are run
  * (distributed count, local merge loop). Truncating to the top words by
  * count is the standard practice: the dropped tail is mass-dominated by
  * the kept head, so it cannot flip a merge decision except at
  * noise-level counts.
  *
  * Encoding is a map-only native expression with the plan-embedded merge
  * ranks ([[graft.functions.BpeEncode]]) — no shuffle, no state, linear in
  * input bytes.
  *
  * Conventions (documented because every BPE dialect chooses):
  *  - words = `lower(text)` split on non-letters (the repo's shingle
  *    convention); pairs never cross word boundaries.
  *  - initial symbols = single characters; no end-of-word marker.
  *  - pair counts include overlaps ("aaa" counts (a,a) twice), each
  *    occurrence weighted by its word's corpus count.
  *  - merge selection: highest total count, ties broken by pair
  *    lexicographic order — fully deterministic.
  *  - applying a merge rewrites left-to-right, greedily,
  *    non-overlapping ("aaa" + merge(a,a) → ["aa", "a"]).
  */
object Bpe {

  /** One corpus pass to the (word, count) table the trainer consumes. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^\\p{L}]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Learn `nMerges` merge rules from a corpus. The distributed part is one
    * aggregation to word grain; the merge loop runs on the driver over the
    * top-`maxWords` words by count (deterministic: ties broken by word).
    */
  def train(
      docs: DataFrame, textCol: String, nMerges: Int,
      minFrequency: Long = 2L, maxWords: Int = 200000): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val top = wordCounts(docs, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(top.toSeq, nMerges, minFrequency)
  }

  /** The merge loop itself, exposed for specs and for callers that already
    * hold a word-frequency table. Incremental: after a merge only the words
    * CONTAINING the merged pair have their pair contributions recounted.
    */
  def trainFromWordCounts(
      wordFreq: Seq[(String, Long)], nMerges: Int,
      minFrequency: Long = 2L): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[mutable.ArrayBuffer[String]] =
      wordFreq.map(w => mutable.ArrayBuffer.from(w._1.map(_.toString))).toArray
    val counts: Array[Long] = wordFreq.map(_._2).toArray
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def addWord(i: Int, sign: Long): Unit = {
      val w = words(i)
      var j = 0
      while (j + 1 < w.length) {
        val p = (w(j), w(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * counts(i)
        if (c == 0L) pairCount.remove(p) else pairCount.update(p, c)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    while (iter < nMerges && pairCount.nonEmpty) {
      // deterministic argmax: highest count, then lexicographic pair
      var best: (String, String) = null
      var bestC = Long.MinValue
      pairCount.foreach { case (p, c) =>
        if (best == null || c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (bestC < minFrequency) iter = nMerges // frequency floor: stop
      else {
        merges += best
        val affected = pairWords.getOrElse(best, mutable.BitSet.empty).toSeq
        affected.foreach { i =>
          addWord(i, -1L) // retract old contributions
          words(i) = mergePair(words(i), best)
          addWord(i, 1L)
        }
        // best itself is gone from every word now; drop its index entry
        pairWords.remove(best)
        pairCount.remove(best)
        iter += 1
      }
    }
    merges.toSeq
  }

  /** Left-to-right greedy non-overlapping merge of one pair in a word. */
  private def mergePair(
      w: scala.collection.mutable.ArrayBuffer[String],
      p: (String, String)): scala.collection.mutable.ArrayBuffer[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < w.length) {
      if (j + 1 < w.length && w(j) == p._1 && w(j + 1) == p._2) {
        out += w(j) + w(j + 1)
        j += 2
      } else {
        out += w(j)
        j += 1
      }
    }
    out
  }

  /** Tokenize a text column with a trained merge table: map-only native
    * expression, plan-embedded ranks (see [[graft.functions.BpeEncode]]).
    * Returns ARRAY<STRING> of tokens (word boundaries respected, word
    * order preserved).
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.graftshim.GraftShims.expression(lower(text)),
        merges.toArray))

  /** Token count under a trained merge table (the budgeting question). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))
}
