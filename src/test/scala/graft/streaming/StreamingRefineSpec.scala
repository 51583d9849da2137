package graft.streaming

import graft.operators.{Charsets, Ingest, Multimodal, TextAnalysis, Warc}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The crawl refine front half under Structured Streaming: WARC explode,
  * charset decode, url_normalize, and the robots gate are all stateless
  * (map-only scalars plus a stream-static broadcast join), so a crawl
  * tailing an archive-arrival stream must produce EXACTLY the batch
  * refine's rows. Pinned via MemoryStream + append sink, micro-batched
  * in two chunks to prove batch-boundary independence.
  */
class StreamingRefineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def archive(aid: Long): Multimodal.MediaRecord = {
    val recs = (0 until 4).map { i =>
      val id = aid * 4 + i
      val text = s"text of doc $id " * 3
      val (body, ct) = (id % 3) match {
        case 0 => (Array(0xff, 0xfe).map(_.toByte) ++ text.getBytes("UTF-16LE"), "text/html")
        case 1 => (text.getBytes("UTF-8") ++ Array(0x80).map(_.toByte), "text/html")
        case _ => (text.getBytes("UTF-8"), "text/html; charset=utf-8")
      }
      Map("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"HTTP://Host${id % 4}.INVALID:80/p/$id?utm_source=x&b=2&a=1#f",
        "WARC-Record-ID" -> s"<urn:t:$id>") -> Warc.httpResponse(200, ct, body)
    }
    Multimodal.MediaRecord(aid, s"t://$aid.warc", "application/warc",
      Warc.writeWarc(recs, gzipped = aid % 2 == 1), Map.empty)
  }

  private def refine(caps: org.apache.spark.sql.Dataset[Ingest.WarcCapture]) = {
    import spark.implicits._
    val robots = spark.range(4).select(
      concat(lit("host"), col("id"), lit(".invalid")).as("host"),
      when(col("id") % 2 === 0,
        lit("User-agent: graftbot\nDisallow: /p/\n\nUser-agent: *\nDisallow: /\n"))
        .otherwise(lit("User-agent: *\nAllow: /\n")).as("robots_txt"))
    caps.filter(col("warc_type") === "response")
      .select(col("url"), col("http_content_type"), col("body"))
      .as[(String, String, Array[Byte])]
      .map { case (url, ct, body) =>
        val d = Charsets.decode(body, ct)
        (url, d.charset, d.clean, d.text)
      }
      .toDF("url", "charset", "clean", "text")
      .withColumn("url_canonical", TextAnalysis.urlNormalize(col("url")))
      .withColumn("host", parse_url(col("url_canonical"), lit("HOST")))
      .join(broadcast(robots), Seq("host"))
      .select(col("url_canonical"), col("charset"), col("clean"),
        TextAnalysis.robotsAllowed(col("robots_txt"), lit("graftbot"),
          parse_url(col("url_canonical"), lit("PATH"))).as("allowed"),
        md5(col("text")).as("text_md5"))
  }

  test("streamed refine equals batch refine row-for-row across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val archives = (0L until 4L).map(archive)
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = refine(Ingest.ingestWarc(stream.toDS()))
      .writeStream.outputMode("append").format("memory")
      .queryName("refine_stream_out").start()
    try {
      archives.grouped(2).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getString(4))
      val streamed = spark.table("refine_stream_out").collect().map(key).sorted
      val batch = refine(Ingest.ingestWarc(spark.createDataset(archives)))
        .collect().map(key).sorted
      assert(streamed.toSeq == batch.toSeq && batch.length == 16)
      // the corpus genuinely exercises the seam: both verdicts, a dirty
      // decode, and all three charsets appear
      assert(batch.map(_._4).distinct.sorted.toSeq == Seq(false, true))
      assert(batch.map(_._3).distinct.sorted.toSeq == Seq(false, true))
      assert(batch.map(_._2).distinct.sorted.toSeq ==
        Seq("utf-16le", "utf-8", "windows-1252"))
    } finally q.stop()
  }
}
