package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JaccardJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus: Seq[(Long, String)] = {
    val words = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val w = words.split(" ")
    val rnd = new scala.util.Random(7)
    // families of near-duplicates + unrelated docs
    (0 until 40).map { i =>
      val base = (0 until 25).map(_ => w(rnd.nextInt(w.length))).mkString(" ")
      i.toLong -> base
    } ++ (100 until 110).map { i =>
      // shared template with small edits: guaranteed high-jaccard pairs
      val tail = (0 until (i - 100)).map(j => w(j % w.length)).mkString(" ")
      i.toLong -> s"$words common shared body of repeated text here $tail"
    }
  }

  private def brutePairs(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    def shingles(s: String): Set[String] = {
      val ws = s.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
      if (ws.length < 3) { if (ws.nonEmpty) Set(ws.mkString(" ")) else Set.empty }
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, s) => id -> shingles(s) }.filter(_._2.nonEmpty)
    (for {
      (i1, s1) <- sh; (i2, s2) <- sh if i1 < i2
      j = s1.intersect(s2).size.toDouble / s1.union(s2).size
      if j >= t
    } yield (i1, i2)).toSet
  }

  test("prefix-filter join matches brute force; both orderings agree") {
    import spark.implicits._
    val docs = corpus
    val df = docs.toDF("doc_id", "text")
    val want = brutePairs(docs, 0.3)
    assert(want.nonEmpty, "fixture must contain qualifying pairs")
    def run(freq: Boolean) =
      Dedup.jaccardSelfJoin(df, "doc_id", "text", 0.3, freqOrder = freq)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byFreq = run(true)
    val byHash = run(false)
    assert(byFreq == want, s"freq-order missed ${want.diff(byFreq)} extra ${byFreq.diff(want)}")
    assert(byHash == want, "hash-order path diverged")
  }

  test("cross-corpus join matches brute force between sides only") {
    import spark.implicits._
    val docs = corpus
    val (evens, odds) = docs.partition(_._1 % 2 == 0)
    val want = brutePairs(docs, 0.3).flatMap { case (i, j) =>
      // brute emits i<j within the whole set; keep only cross-parity,
      // oriented (even, odd)
      if (i % 2 == 0 && j % 2 == 1) Some((i, j))
      else if (i % 2 == 1 && j % 2 == 0) Some((j, i))
      else None
    }
    val got = Dedup.jaccardCrossJoin(
        evens.toDF("doc_id", "text"), "doc_id", "text",
        odds.toDF("doc_id", "text"), "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want,
      s"missed ${want.diff(got)} extra ${got.diff(want)}")
  }

  test("threshold 1.0 returns only identical shingle sets") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "one two three four five seven")).toDF("doc_id", "text")
    val got = Dedup.jaccardSelfJoin(df, "doc_id", "text", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 1.0)))
  }
}
