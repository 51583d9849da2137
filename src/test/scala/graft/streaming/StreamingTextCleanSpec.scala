package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-ingest composition: raw HTML pages stream through html_to_text →
  * unicodeClean → quality gate → two-tier deduped ingest — the same column
  * expressions the batch pipeline uses, unchanged, upstream of
  * [[StreamingIngest.dedupedIngest]]. Asserts exact batch equivalence:
  * the streamed sink holds precisely the rows the batch formulation of the
  * identical pipeline produces (extraction parity, gate parity, dedup on
  * the EXTRACTED text so boilerplate-only markup differences still dedup).
  */
class StreamingTextCleanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def page(body: String, junk: String = ""): String =
    s"""<html><head><style>p{}</style></head><body><!-- crawl -->$junk<p>$body</p><script>track();</script></body></html>"""

  // the shared pipeline: extraction + cleanup + a minimum-length gate
  private def cleanPipeline(docs: DataFrame): DataFrame =
    docs.withColumn("text",
        graft.operators.TextAnalysis.unicodeClean(
          graft.operators.TextAnalysis.htmlToText(col("html"))))
      .filter(length(col("text")) >= 20)
      .drop("html")

  test("streamed crawl ingest == batch pipeline (extraction, gate, dedup)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val tmp = java.nio.file.Files.createTempDirectory("txclean").toFile
    val out = new java.io.File(tmp, "sink").getAbsolutePath
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath

    val rows = Seq(
      // two pages with DIFFERENT markup but identical visible text: must
      // dedup after extraction (the reason the clean runs before ingest)
      (1L, page("the quick brown fox jumps over the lazy dog"), base),
      (2L, page("the quick brown fox jumps over the lazy dog",
        junk = "<div class=\"nav\"> </div>"), base + 100),
      // control-char mess that unicodeClean must normalize away
      (3L, page("seventeen magpies argue \u0007about parquet footers"), base + 200),
      // too short after extraction: the gate drops it
      (4L, page("tiny"), base + 300),
      // distinct long page: kept
      (5L, page("shuffle partitions idle while the optimizer reorders joins"), base + 400))

    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDS().toDF("doc_id", "html", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
    val q = StreamingIngest.dedupedIngest(
      cleanPipeline(docs), "eventTime", "1 second", "text", out, ckpt)
    try {
      stream.addData(rows.take(3))
      q.processAllAvailable()
      stream.addData(rows.drop(3))
      q.processAllAvailable()

      val sink = spark.read.parquet(out)
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)

      // batch formulation of the IDENTICAL pipeline (dedup keeps first by
      // fingerprint, like the stream's state tier)
      val batch = cleanPipeline(
          rows.toDF("doc_id", "html", "tsMillis"))
        .withColumn("_fp", graft.operators.TextAnalysis.fingerprint(col("text")))
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("_fp").orderBy("doc_id")))
        .filter(col("_rn") === 1)
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)

      assert(sink.toSeq == batch.toSeq, s"stream ${sink.toSeq} != batch ${batch.toSeq}")
      assert(sink.map(_._1).toSeq == Seq(1L, 3L, 5L))
      // extraction really ran: no markup, no control chars in the sink
      sink.foreach { case (_, t) =>
        assert(!t.contains("<") && !t.contains("\u0007"), t)
      }
      assert(sink.find(_._1 == 3L).get._2 ==
        "seventeen magpies argue about parquet footers")
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }

  test("streamed html_anchors and html_blocks match batch row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pages = (0L until 6L).map { id =>
      val (url, html) = graft.operators.Ingest.watPage(id)
      (id, url, html + s"<div><a href='/m$id'>menu</a></div><p>body text for $id</p>")
    }
    // map-only extraction: anchors + blocks explode under Structured
    // Streaming exactly as in batch (the segmentation/extraction stage of
    // a streaming crawl pipeline; classification joins in foreachBatch)
    def extract(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.htmlAnchors(
          col("html"), col("url"))).as("a"),
        graft.operators.TextAnalysis.htmlBlocks(col("html")).as("blocks"))
      .select(col("doc_id"), col("a.url").as("dst"), col("a.text").as("label"),
        size(col("blocks")).as("n_blocks"))
    val stream = MemoryStream[(Long, String, String)]
    val q = extract(stream.toDS().toDF("doc_id", "url", "html"))
      .writeStream.outputMode("append").format("memory")
      .queryName("anchor_stream_out").start()
    try {
      stream.addData(pages)
      q.processAllAvailable()
      val streamed = spark.table("anchor_stream_out")
        .as[(Long, String, String, Int)].collect().sorted
      val batch = extract(pages.toDF("doc_id", "url", "html"))
        .as[(Long, String, String, Int)].collect().sorted
      assert(streamed.length == batch.length && streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
      // the extra nav anchor rode along with the seven watPage links
      assert(streamed.count(_._3 == "menu") == 6)
    } finally q.stop()
  }

  test("streamed anchor-text index (complete mode) == batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pages = (0L until 8L).map(id => graft.operators.Ingest.watPage(id))
    def index(df: DataFrame): DataFrame = df
      .select(explode(graft.operators.TextAnalysis.htmlAnchors(
        col("html"), col("url"))).as("a"))
      .select(graft.operators.TextAnalysis.urlNormalize(col("a.url")).as("dst"),
        col("a.text").as("text"))
      .withColumn("host", parse_url(col("dst"), lit("HOST")))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_links"),
        array_join(array_sort(collect_set(col("text"))), "|").as("texts"))
    val stream = MemoryStream[(String, String)]
    val q = index(stream.toDS().toDF("url", "html"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("anchor_index_out").start()
    try {
      stream.addData(pages.take(3))
      q.processAllAvailable()
      stream.addData(pages.drop(3)) // the index must ACCUMULATE across batches
      q.processAllAvailable()
      val streamed = spark.table("anchor_index_out")
        .as[(String, Long, String)].collect().sortBy(_._1)
      val batch = index(pages.toDF("url", "html"))
        .as[(String, Long, String)].collect().sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed.map(_._2).sum == 8L * 7) // 7 kept links per page
    } finally q.stop()
  }
}
