package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ContaminationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("planted eval-set leakage is detected; disjoint content is not") {
    import spark.implicits._
    val benchmark = "what is the capital of france paris is the capital and largest city of france"
    val train = Seq(
      (1L, s"some web page content $benchmark and then more unrelated trailing text"),
      (2L, "completely independent document about distributed systems and consensus protocols"),
      (3L, "another clean doc discussing columnar storage and vectorized execution engines")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, benchmark),
      (101L, "how many moons does jupiter have in total as of current astronomical surveys")
    ).toDF("doc_id", "text")
    val hits = Contamination.overlap(eval, "doc_id", "text", train, "doc_id", "text",
        threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(hits.exists(h => h._1 == 100L && h._2 == 1L && h._3 > 0.5),
      s"leaked benchmark not detected: ${hits.mkString(",")}")
    assert(!hits.exists(h => h._1 == 101L), "false positive on clean eval doc")
    assert(!hits.exists(h => h._2 == 2L || h._2 == 3L), "false positive on clean train docs")

    // the remover: contaminated train doc 1 is dropped, clean docs survive
    val clean = Contamination.decontaminate(train, "doc_id", "text",
        eval, "doc_id", "text", threshold = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(clean == Seq(2L, 3L), s"got $clean")
    // threshold high enough that nothing is flagged -> corpus untouched
    val untouched = Contamination.decontaminate(train, "doc_id", "text",
        eval, "doc_id", "text", threshold = 0.99)
      .count()
    assert(untouched == 3L)
  }

  test("bloom-pruned overlap returns exactly the unpruned result") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    val train = (0 until 200).map { i =>
      val body = if (i % 17 == 0) s"doc $i prefix $shared suffix $i"
      else s"clean document number $i about topic ${i % 7} with its own distinct words $i"
      (i.toLong, body)
    }.toDF("doc_id", "text")
    val eval = Seq(
      (900L, shared),
      (901L, "entirely different benchmark question with no training presence at all")
    ).toDF("doc_id", "text")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val plain = collectPairs(Contamination.overlap(
      eval, "doc_id", "text", train, "doc_id", "text", threshold = 0.1))
    val pruned = collectPairs(Contamination.overlapPruned(
      eval, "doc_id", "text", train, "doc_id", "text", threshold = 0.1,
      expectedBFingerprints = 100000L))
    assert(plain.nonEmpty, "fixture should produce overlap pairs")
    assert(pruned == plain, s"pruned diverged: ${pruned.diff(plain)} / ${plain.diff(pruned)}")
  }

  test("maxPostings cap scores docs on distinctive content, not boilerplate") {
    import spark.implicits._
    val boiler = "copyright notice all rights reserved terms of service apply to this document"
    val leak = "the treaty of westphalia ended the thirty years war in sixteen forty eight"
    // 20 train docs all carry the boilerplate -> its fingerprints have 20
    // postings, over the cap of 5; doc 0 also carries the leaked sentence
    val train = (0 until 20).map { i =>
      val extra = if (i == 0) s" $leak" else s" unique filler ${i * 31} for doc $i"
      (i.toLong, s"$boiler$extra")
    }.toDF("doc_id", "text")
    // eval doc = boilerplate + the leaked sentence; its boilerplate
    // fingerprints are capped on BOTH sides, so the score is measured over
    // the distinctive (leaked) fingerprints only -> high overlap
    val eval = Seq(
      (900L, s"$boiler $leak"),
      (901L, boiler) // pure boilerplate: all fingerprints capped -> no pairs
    ).toDF("doc_id", "text")
    val hits = Contamination.overlap(eval, "doc_id", "text",
        train, "doc_id", "text", threshold = 0.1, maxPostings = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    val leakHit = hits.filter(h => h._1 == 900L && h._2 == 0L)
    assert(leakHit.nonEmpty, s"distinctive leak not detected: ${hits.mkString(",")}")
    assert(leakHit.head._3 > 0.5,
      s"boilerplate diluted the leak score: ${leakHit.head._3} (a_total must be post-cap)")
    assert(!hits.exists(h => h._2 > 0L),
      s"boilerplate-only train docs must produce no pairs: ${hits.mkString(",")}")
    assert(!hits.exists(_._1 == 901L),
      "all-boilerplate eval doc has no identifiable overlap")
    // sanity: WITHOUT the cap, boilerplate alone manufactures pairs between
    // the eval doc and every unrelated train doc — the quadratic blowup and
    // false-positive source the cap exists to remove
    val uncapped = Contamination.overlap(eval, "doc_id", "text",
        train, "doc_id", "text", threshold = 0.1, maxPostings = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(uncapped.count(h => h._2 > 0L) > 10,
      s"expected boilerplate false-positive pairs without cap: ${uncapped.length}")
  }

  test("kmv shard matrix ranks the contaminated shard; disjoint shards at 0") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val train = ((0 until 50).map(i =>
        ("dirty", i.toLong, s"doc $i with $shared plus local tail $i")) ++
      (0 until 50).map(i =>
        ("clean", 100L + i, s"unrelated shard content piece $i nothing borrowed here $i")))
      .toDF("shard", "doc_id", "text")
    val eval = Seq(("bench", 900L, shared)).toDF("shard", "doc_id", "text")
    val m = Contamination.groupOverlapMatrix(
        train, "shard", "text", eval, "shard", "text")
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(m("dirty") > 0.0, s"contaminated shard not flagged: $m")
    assert(m("clean") == 0.0, s"clean shard estimated nonzero: $m")
  }
}
