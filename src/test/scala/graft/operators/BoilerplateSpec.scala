package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Long, String)],
      minChars: Int = 80, maxLinkPermille: Int = 350) = {
    import spark.implicits._
    TextAnalysis.extractMainText(
      rows.toDF("doc_id", "html"), "html", "doc_id", minChars, maxLinkPermille)
      .orderBy("doc_id")
      .collect()
  }

  test("the demo page classifies and reassembles exactly as predicted") {
    val id = 7L
    val k = 20 + (id % 7).toInt // 27 words per good paragraph
    val Seq(r) = run(Seq(id -> graft.operators.Ingest.boilerplatePage(id))).toSeq
    assert(r.getAs[Long]("n_blocks") == 6)
    assert(r.getAs[Long]("n_good_ctx") == 2)
    assert(r.getAs[Long]("n_short_ctx") == 2)
    assert(r.getAs[Long]("n_bad_ctx") == 2)
    assert(r.getAs[Long]("n_good_final") == 4)
    val lorem = ("lorem " * k).trim
    val ipsum = ("ipsum " * k).trim
    assert(r.getAs[String]("main_text") ==
      s"hdr $id 1\n$lorem\nhdr $id 4\n$ipsum")
    assert(r.getAs[Long]("main_chars") == 2 * (6 + id.toString.length) + 2 * (6 * k - 1))
  }

  test("short blocks promote only next to a context-free good neighbor") {
    val good = "w" * 100
    // short between two bads -> bad; short before a good -> good
    val html =
      s"""<p><a href="/x">${"l" * 50}</a></p><h1>lost</h1>
         |<p><a href="/y">${"l" * 50}</a></p><h2>kept</h2><p>$good</p>""".stripMargin
    val Seq(r) = run(Seq(1L -> html)).toSeq
    assert(r.getAs[Long]("n_good_final") == 2) // "kept" + the good paragraph
    assert(r.getAs[String]("main_text") == s"kept\n$good")
  }

  test("a neighboring SHORT block does not transitively promote") {
    // short, short, good: only the short adjacent to the good promotes
    val good = "w" * 100
    val Seq(r) = run(Seq(1L -> s"<h1>far</h1><h2>near</h2><p>$good</p>")).toSeq
    assert(r.getAs[Long]("n_good_final") == 2)
    assert(r.getAs[String]("main_text") == s"near\n$good")
  }

  test("an all-boilerplate page keeps nothing but still reports") {
    val Seq(r) = run(Seq(1L -> """<p><a href="/m">only links here</a></p>""")).toSeq
    assert(r.getAs[Long]("n_blocks") == 1)
    assert(r.getAs[Long]("n_good_final") == 0)
    assert(r.getAs[String]("main_text") == "")
  }

  test("thresholds are parameters: permissive settings keep everything") {
    val html = """<p><a href="/m">short link</a></p>"""
    val Seq(r) = run(Seq(1L -> html), minChars = 5, maxLinkPermille = 1000).toSeq
    assert(r.getAs[Long]("n_good_final") == 1)
    assert(r.getAs[String]("main_text") == "short link")
  }

  test("threshold validation rejects nonsense") {
    import spark.implicits._
    val df = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    intercept[IllegalArgumentException] {
      TextAnalysis.extractMainText(df, "html", "doc_id", minChars = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.extractMainText(df, "html", "doc_id", maxLinkPermille = 1001)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.extractMainText(df, "html", "doc_id",
        stopwords = Seq("the"), stopLowPermille = 500, stopHighPermille = 400)
    }
  }

  private def runStop(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextAnalysis.extractMainText(
      rows.toDF("doc_id", "html"), "html", "doc_id",
      stopwords = graft.functions.TextStatsProfiles.stopwords("en"),
      stopLowPermille = 150, stopHighPermille = 400)
      .orderBy("doc_id").collect()
  }

  test("stopword mode: the demo page classifies per full jusText") {
    val id = 3L
    val k = (10 + id % 5).toInt
    val k2 = (8 + id % 3).toInt
    val Seq(r) = runStop(Seq(id -> graft.operators.Ingest.stopwordPage(id))).toSeq
    assert(r.getAs[Long]("n_blocks") == 8)
    assert(r.getAs[Long]("n_good_ctx") == 1)
    assert(r.getAs[Long]("n_near_ctx") == 2)
    assert(r.getAs[Long]("n_short_ctx") == 1)
    assert(r.getAs[Long]("n_bad_ctx") == 4)
    assert(r.getAs[Long]("n_good_final") == 3)
    val article = ("the cat and the dog " * k).trim
    val mid = ("green tea is fine here " * k2).trim
    assert(r.getAs[String]("main_text") == s"On widget reviews\n$article\n$mid")
    assert(r.getAs[Long]("main_chars") == 17 + (20 * k - 1) + (23 * k2 - 1))
  }

  test("stopword mode: keyword stuffing reclassifies from good to bad") {
    val stuffed = ("buy cheap widget pills " * 10).trim
    // link-only policy: long, no links -> good
    val Seq(a) = run(Seq(1L -> s"<p>$stuffed</p>")).toSeq
    assert(a.getAs[Long]("n_good_final") == 1)
    // stopword policy: 0 permille -> bad, nothing kept
    val Seq(b) = runStop(Seq(1L -> s"<p>$stuffed</p>")).toSeq
    assert(b.getAs[Long]("n_good_final") == 0)
    assert(b.getAs[String]("main_text") == "")
  }

  test("stopword mode: near_good lives or dies by its neighbors") {
    val article = ("the cat and the dog " * 10).trim
    val mid = ("green tea is fine here " * 8).trim
    // beside the article: promoted
    val Seq(a) = runStop(Seq(1L -> s"<p>$article</p><p>$mid</p>")).toSeq
    assert(a.getAs[Long]("n_good_final") == 2)
    // alone: demoted
    val Seq(b) = runStop(Seq(1L -> s"<p>$mid</p>")).toSeq
    assert(b.getAs[Long]("n_good_final") == 0)
  }

  test("stopword mode: a wordless block never passes the density tests") {
    val article = ("the cat and the dog " * 10).trim
    // a long numeric-table block has _nw = 0: the density tests must not
    // pass vacuously (0 >= 0) — jusText's intent for a wordless block is
    // bad, both at long grain and as a stub riding a neighbor
    val digits = ("12345 67.89 | " * 10).trim
    val Seq(a) = runStop(Seq(1L -> s"<p>$digits</p>")).toSeq
    assert(a.getAs[Long]("n_good_ctx") == 0)
    assert(a.getAs[Long]("n_bad_ctx") == 1)
    assert(a.getAs[String]("main_text") == "")
    // a wordless SHORT stub beside a good article stays bad (no riding)
    val Seq(b) = runStop(Seq(1L -> s"<h2>--- 42 ---</h2><p>$article</p>")).toSeq
    assert(b.getAs[Long]("n_short_ctx") == 0)
    assert(b.getAs[Long]("n_bad_ctx") == 1)
    assert(b.getAs[String]("main_text") == article)
  }

  test("stopword mode: a short stub without stopwords does not ride a neighbor") {
    val article = ("the cat and the dog " * 10).trim
    val Seq(r) = runStop(Seq(
      1L -> s"<h1>On widget reviews</h1><h2>Widget specs</h2><p>$article</p>")).toSeq
    // h1 (333 permille, short) does NOT promote: its neighbors are the
    // bad h2 and nothing; h2 (0 permille) is ctx-bad outright
    assert(r.getAs[Long]("n_short_ctx") == 1)
    assert(r.getAs[Long]("n_bad_ctx") == 1)
    assert(r.getAs[String]("main_text") == article)
  }
}
