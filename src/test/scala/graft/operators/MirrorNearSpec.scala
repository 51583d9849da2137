package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the near-mirror plant end to end: `Ingest.mirrorPage` →
  * `extractMainText` → token simhash. The contract (`tx_mirror_near`)
  * depends on the PLANTED hamming distances staying where they were
  * selected — this spec fails loudly if a tokenizer, hash, or
  * boilerplate-policy change silently moves them.
  */
class MirrorNearSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mainTextHashes: Map[Int, Long] = {
    val sp = spark
    import sp.implicits._
    val pages = (0L until 20L).map(k => (s"src$k.invalid", Ingest.mirrorPage(k)))
      .toDF("host", "html")
    TextAnalysis.extractMainText(pages, "html", "host")
      .select(col("host"), Dedup.simhash64(col("main_text")).as("sh"))
      .collect()
      .map(r => r.getString(0).stripPrefix("src").stripSuffix(".invalid").toInt
        -> r.getLong(1))
      .toMap
  }

  test("planted distances: 0 for banner mirrors, 1-3 for the near plant, >3 otherwise") {
    val sh = mainTextHashes
    assert(sh.size == 20)
    def d(a: Int, b: Int) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    val plantedNear = Map(0 -> 3, 1 -> 1, 2 -> 1, 3 -> 2, 4 -> 2) // selection record
    for (g <- 0 until 5) {
      assert(d(g, g + 5) == 0, s"group $g roles 0/1 must be exact mirrors")
      assert(d(g, g + 10) == plantedNear(g),
        s"group $g near plant drifted: ${d(g, g + 10)} != ${plantedNear(g)}")
      assert(d(g + 5, g + 10) == plantedNear(g))
    }
    val expected = (0 until 5).flatMap(g =>
      Seq((g, g + 5), (g, g + 10), (g + 5, g + 10))).toSet
    for (a <- 0 until 20; b <- a + 1 until 20 if !expected.contains((a, b))) {
      assert(d(a, b) > 3, s"unplanted pair ($a,$b) at hamming ${d(a, b)}")
    }
  }

  test("boilerplate policy strips exactly the two banner blocks") {
    val sp = spark
    import sp.implicits._
    val pages = Seq(("h", Ingest.mirrorPage(7L))).toDF("host", "html")
    val row = TextAnalysis.extractMainText(pages, "html", "host").collect()(0)
    assert(row.getAs[Long]("n_blocks") == 5)
    assert(row.getAs[Long]("n_bad_ctx") == 2)   // nav + footer
    assert(row.getAs[Long]("n_good_final") == 3) // h1 (promoted) + 2 paragraphs
    val text = row.getAs[String]("main_text")
    assert(text.startsWith("Shared title groupc"))
    assert(!text.toLowerCase.contains("mirror") && !text.contains("Privacy"))
  }

  test("pair recovery through the real blocking join") {
    val sp = spark
    import sp.implicits._
    val pages = (0L until 20L).map(k => (s"src$k.invalid", Ingest.mirrorPage(k)))
      .toDF("host", "html")
    val main = TextAnalysis.extractMainText(pages, "html", "host")
      .select(col("host"), col("main_text"))
    val got = Dedup.simhashNearDupPairs(main, "main_text", "host", maxHamming = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2) == 0))
      .toSet
    def h(k: Int) = s"src$k.invalid"
    def pair(a: Int, b: Int, exact: Boolean) = {
      val (x, y) = if (h(a) < h(b)) (h(a), h(b)) else (h(b), h(a))
      (x, y, exact)
    }
    val want = (0 until 5).flatMap(g => Seq(
      pair(g, g + 5, exact = true),
      pair(g, g + 10, exact = false),
      pair(g + 5, g + 10, exact = false))).toSet
    assert(got == want)
  }
}
