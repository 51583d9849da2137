package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SubstringContainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairs(docs: Seq[(Long, String)],
      gram: Int = 32, stride: Int = 8,
      maxBucket: Int = Int.MaxValue): Set[(Long, Long)] = {
    import spark.implicits._
    Dedup.substringContainment(docs.toDF("doc_id", "text"), "doc_id", "text",
        gram, stride, maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def brute(docs: Seq[(Long, String)], minLen: Int): Set[(Long, Long)] =
    (for {
      (ia, ta) <- docs if ta.length >= minLen
      (ib, tb) <- docs
      if ia != ib && ta.length < tb.length && tb.contains(ta)
    } yield (ia, ib)).toSet

  test("planted substrings found at every alignment offset") {
    val base = "The quick brown fox jumps over the lazy dog while seventeen " +
      "magpies argue about parquet footers and shuffle partitions in the yard."
    // inner doc planted at offsets 0..12 inside distinct containers: every
    // residue class of the stride must be recalled
    val inner = "magpies argue about parquet footers and shuffle"
    val docs = (0 until 13).map { off =>
      (100L + off, base.take(off) + "x" * off + inner + " tail " + base)
    } :+ (1L, inner)
    val got = pairs(docs)
    assert(got == brute(docs, 39))
    // every alignment residue recalled (doc 100 also nests in 101..112,
    // which brute force confirms — only the 13 planted pairs are asserted)
    assert((0 until 13).forall(off => got.contains((1L, 100L + off))))
  }

  test("matches brute force on a messy corpus incl. chained containment") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      1L -> a,                                 // inner
      2L -> ("prefix " + a + " suffix"),       // contains 1
      3L -> ("pre2 " + a + " suffix and then some more words here"), // contains 1
      4L -> ("zz " + "prefix " + a + " suffix" + " tail"), // contains 1 and 2
      5L -> "completely unrelated text about distributed query engines okay",
      6L -> "short doc under the min length",  // excluded by length filter
      7L -> a.toUpperCase)                     // case differs: no match
    assert(pairs(docs) == brute(docs, 39))
    assert(pairs(docs).contains((2L, 4L))) // chained: container contained
  }

  test("maxBucket caps hot anchors without false positives") {
    // 60 containers all sharing the same boilerplate inner: anchors are hot
    val inner = "standard legal boilerplate notice shared by every document"
    val docs = (0 until 60).map(i =>
      (i.toLong, s"doc $i header " + inner + s" unique trailer $i")) :+
      (999L, inner)
    val exact = pairs(docs)
    assert(exact == brute(docs, 39) && exact.size == 60)
    // capping drops hot container anchors -> recall may drop, never precision
    val capped = pairs(docs, maxBucket = 10)
    assert(capped.subsetOf(exact))
  }
}
