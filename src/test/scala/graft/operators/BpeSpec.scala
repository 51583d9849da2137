package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer/encoder contract, pinned against an INDEPENDENT naive
  * reference implementation (full pair recount every iteration — the
  * textbook algorithm, no incremental bookkeeping to share bugs with).
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Textbook BPE: recount every pair each iteration. O(iters × corpus) —
    * test-only oracle.
    */
  private def naiveTrain(
      wordFreq: Seq[(String, Long)], nMerges: Int,
      minFrequency: Long = 2L): Seq[(String, String)] = {
    var words = wordFreq.map { case (w, c) => (w.map(_.toString).toList, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.length < nMerges && continue) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < minFrequency) continue = false
        else {
          merges += best._1
          words = words.map { case (syms, c) => (applyMerge(syms, best._1), c) }
        }
      }
    }
    merges.toSeq
  }

  private def applyMerge(syms: List[String], p: (String, String)): List[String] =
    syms match {
      case a :: b :: rest if a == p._1 && b == p._2 =>
        (a + b) :: applyMerge(rest, p)
      case a :: rest => a :: applyMerge(rest, p)
      case Nil => Nil
    }

  /** Reference encode: replay the training merges in order. */
  private def naiveEncode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toList)((syms, m) => applyMerge(syms, m))

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the lowest common denominator is lower than the low bar",
    "newer wider lower slower the the the thesis theory there",
    "banana bandana cabana canal panama anagram",
    "aaa aaaa aaaaa overlapping pairs must count overlaps")

  private def wordFreq(docs: Seq[String]): Seq[(String, Long)] =
    docs.flatMap(_.toLowerCase.split("[^\\p{L}]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
      .sortBy { case (w, c) => (-c, w) }

  test("incremental trainer reproduces the textbook merge sequence exactly") {
    val wf = wordFreq(corpus)
    for (n <- Seq(0, 1, 5, 20, 100)) {
      val fast = Bpe.trainFromWordCounts(wf, n, minFrequency = 2L)
      val slow = naiveTrain(wf, n, minFrequency = 2L)
      assert(fast == slow, s"nMerges=$n")
    }
    // minFrequency floor: a higher floor is a strict prefix of a lower one
    val all = Bpe.trainFromWordCounts(wf, 100, minFrequency = 2L)
    val floored = Bpe.trainFromWordCounts(wf, 100, minFrequency = 5L)
    assert(all.startsWith(floored) && floored.length < all.length)
  }

  test("overlapping pairs count overlaps; merges apply left-to-right greedily") {
    // "aaaa" x1: pairs (a,a) count 3; after merge(a,a): ["aa","aa"]
    val merges = Bpe.trainFromWordCounts(Seq(("aaaa", 1L)), 2, minFrequency = 1L)
    assert(merges == Seq(("a", "a"), ("aa", "aa")))
  }

  test("native encode equals sequential replay of the training merges") {
    import spark.implicits._
    val wf = wordFreq(corpus)
    val merges = Bpe.trainFromWordCounts(wf, 50)
    val got = corpus.toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(_.getSeq[String](0))
    val want = corpus.map(_.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
      .flatMap(w => naiveEncode(w, merges)).toSeq)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"doc $i")
    }
    // roundtrip: token concatenation reproduces the letter stream
    got.zip(corpus).foreach { case (toks, doc) =>
      assert(toks.mkString("") ==
        doc.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).mkString(""))
    }
  }

  test("training through the DataFrame path is deterministic and bounded") {
    import spark.implicits._
    val df = corpus.toDF("text")
    val a = Bpe.train(df, "text", nMerges = 30)
    val b = Bpe.train(df, "text", nMerges = 30)
    // the tiny corpus runs dry under the default minFrequency floor before
    // 30 merges — the point is identity and a hard bound, not the count
    assert(a == b && a.nonEmpty && a.length <= 30)
    assert(a == Bpe.trainFromWordCounts(wordFreq(corpus), 30))
    // maxWords truncation keeps the head by (count desc, word): with a cap
    // of 3 words only those words' pairs can be learned
    val capped = Bpe.train(df, "text", nMerges = 5, maxWords = 3)
    val top3 = wordFreq(corpus).take(3).map(_._1)
    val legal = top3.flatMap(w => w.sliding(2).map(p => (p(0).toString, p(1).toString))).toSet
    assert(capped.head match { case (l, r) => legal.contains((l, r)) || l.length > 1 || r.length > 1 })
  }

  test("encode tolerates empty, single-char, and symbol-free input") {
    import spark.implicits._
    val merges = Seq(("t", "h"), ("th", "e"))
    val got = Seq("", "a", "123 456 !!!", "the the", "x the y")
      .toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq())
    assert(got(1) == Seq("a"))
    assert(got(2) == Seq())
    assert(got(3) == Seq("the", "the"))
    assert(got(4) == Seq("x", "the", "y"))
  }
}
