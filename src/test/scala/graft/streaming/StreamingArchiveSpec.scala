package graft.streaming

import graft.operators.{Ingest, Multimodal, Tar, Warc, Zip}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The triage probe and the archive ingest are stateless typed
  * transforms, so they must behave IDENTICALLY under Structured
  * Streaming — a crawl pipeline tails an archive-arrival stream with the
  * same operators the batch backfill uses. These specs pin
  * batch-equivalence through MemoryStream + append-mode sinks (no state,
  * no watermark needed — the operators are map/flatMap-only).
  */
class StreamingArchiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mixedRecords: Seq[Multimodal.MediaRecord] = Seq(
    Multimodal.MediaRecord(0L, "t://a.png", "image/png",
      Multimodal.deterministicPng(1L, 16, 8), Map.empty),
    Multimodal.MediaRecord(1L, "t://b.flac", "audio/flac",
      Multimodal.deterministicFlacCompressed(2L, 16000, 400, 2), Map.empty),
    Multimodal.MediaRecord(2L, "t://c.mp3", "audio/mpeg",
      Multimodal.deterministicMp3(3L), Map.empty),
    Multimodal.MediaRecord(3L, "t://d.avi", "video/avi",
      Multimodal.deterministicAvi(4L, 16, 16, 3), Map.empty),
    Multimodal.MediaRecord(4L, "t://e.bin", "application/octet-stream",
      "not media at all".getBytes("UTF-8"), Map.empty))

  test("streaming probeMedia matches batch row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = Multimodal.probeMedia(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("probe_stream_out").start()
    try {
      mixedRecords.grouped(2).foreach { chunk => // micro-batches
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("probe_stream_out")
        .as[Multimodal.MediaProbe].collect().sortBy(_.media_id)
      val batch = Multimodal.probeMedia(spark.createDataset(mixedRecords))
        .collect().sortBy(_.media_id)
      assert(streamed.toSeq == batch.toSeq)
      assert(batch.map(_.container).toSeq == Seq("png", "flac", "mp3", "avi", "unknown"))
    } finally q.stop()
  }

  test("streaming ingestWarc and ingestTar match batch explode-for-explode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def warcArchive(aid: Long, gz: Boolean): Multimodal.MediaRecord = {
      val recs = (0 until 3).map { i =>
        Map("WARC-Type" -> "response", "WARC-Target-URI" -> s"http://x.invalid/$aid/$i",
          "WARC-Record-ID" -> s"<urn:t:$aid:$i>") ->
          Warc.httpResponse(if (i == 1) 404 else 200, "text/plain",
            s"body $aid $i".getBytes("UTF-8"))
      }
      Multimodal.MediaRecord(aid, s"t://$aid.warc", "application/warc",
        Warc.writeWarc(recs, gzipped = gz), Map.empty)
    }
    val archives = Seq(warcArchive(0L, gz = false), warcArchive(1L, gz = true))
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = Ingest.ingestWarc(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("warc_stream_out").start()
    try {
      stream.addData(archives)
      q.processAllAvailable()
      val streamed = spark.table("warc_stream_out")
        .as[Ingest.WarcCapture].collect()
        .map(c => (c.archive_id, c.url, c.http_status, c.content_length))
        .sortBy(t => (t._1, t._2))
      val batch = Ingest.ingestWarc(spark.createDataset(archives))
        .collect()
        .map(c => (c.archive_id, c.url, c.http_status, c.content_length))
        .sortBy(t => (t._1, t._2))
      assert(streamed.toSeq == batch.toSeq && batch.length == 6)
    } finally q.stop()

    val tarArchives = Seq(
      Multimodal.MediaRecord(0L, "t://0.tar", "application/x-tar",
        Tar.writeTar(Seq(
          Tar.TarEntry("a/x.txt", 3, '0', "abc".getBytes),
          Tar.TarEntry("a/y.txt", 600, '0', Array.fill(600)(7.toByte)))), Map.empty))
    val stream2 = MemoryStream[Multimodal.MediaRecord]
    val q2 = Ingest.ingestTar(stream2.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("tar_stream_out").start()
    try {
      stream2.addData(tarArchives)
      q2.processAllAvailable()
      val streamed = spark.table("tar_stream_out")
        .as[Ingest.TarMember].collect().map(m => (m.name, m.size)).sorted
      assert(streamed.toSeq == Seq("a/x.txt" -> 3L, "a/y.txt" -> 600L))
    } finally q2.stop()
  }

  test("streaming ingestZip matches batch, deflate members inflated identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def zipArchive(aid: Long, deflate: Boolean): Multimodal.MediaRecord = {
      val members = (0 until 3).map(i => s"d$aid/m$i.txt" ->
        (s"member $aid $i " * (i * 13 + 1)).getBytes("UTF-8"))
      Multimodal.MediaRecord(aid, s"t://$aid.zip", "application/zip",
        Zip.writeZip(members, deflate = deflate), Map.empty)
    }
    val archives = Seq(zipArchive(0L, deflate = false), zipArchive(1L, deflate = true))
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = Ingest.ingestZip(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("zip_stream_out").start()
    try {
      stream.addData(archives)
      q.processAllAvailable()
      val key = (r: Ingest.ZipMemberRow) =>
        (r.archive_id, r.name, r.method, r.size, r.payload.toSeq)
      val streamed = spark.table("zip_stream_out")
        .as[Ingest.ZipMemberRow].collect().map(key).sortBy(t => (t._1, t._2))
      val batch = Ingest.ingestZip(spark.createDataset(archives))
        .collect().map(key).sortBy(t => (t._1, t._2))
      assert(streamed.toSeq == batch.toSeq && batch.length == 6)
      assert(batch.map(_._3).distinct.sorted.toSeq == Seq("deflate", "store"))
    } finally q.stop()
  }

  test("streaming revisit verdicts match batch (stream-static digest join)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def crawl(changed: Boolean): Multimodal.MediaRecord = {
      val recs = (0L until 3L).map { id =>
        Map("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"http://h.invalid/s/$id",
          "WARC-Record-ID" -> s"<urn:t:srv:$id>") ->
          Warc.httpResponse(200, "text/plain",
            (s"body $id" + (if (changed && id == 1) " v2" else "")).getBytes("UTF-8"))
      }
      Multimodal.MediaRecord(0L, "t://srv.warc", "application/warc",
        Warc.writeWarc(recs), Map.empty)
    }
    val idx = Ingest.revisitIndex(spark.createDataset(Seq(crawl(changed = false))))
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = Ingest.revisitVerdicts(Ingest.ingestWarc(stream.toDS()), idx)
      .writeStream.outputMode("append").format("memory")
      .queryName("revisit_stream_out").start()
    try {
      stream.addData(Seq(crawl(changed = true)))
      q.processAllAvailable()
      val streamed = spark.table("revisit_stream_out").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val batch = Ingest.revisitVerdicts(
        Ingest.ingestWarc(spark.createDataset(Seq(crawl(changed = true)))), idx)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(streamed == batch)
      assert(streamed == Map(
        "http://h.invalid/s/0" -> "revisit",
        "http://h.invalid/s/1" -> "response",
        "http://h.invalid/s/2" -> "revisit"))
    } finally q.stop()
  }

  test("streaming toWat matches batch byte-for-byte (map-only derivation)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val archives = Seq(false, true).zipWithIndex.map { case (gz, aid) =>
      val recs = (0 until 2).map { i =>
        val id = aid * 2L + i
        val (url, html) = Ingest.watPage(id)
        Map("WARC-Type" -> "response", "WARC-Target-URI" -> url,
          "WARC-Record-ID" -> s"<urn:t:wat:$id>",
          "WARC-Date" -> "2026-01-01T00:00:00Z") ->
          Warc.httpResponse(200, "text/html", html.getBytes("UTF-8"))
      }
      Multimodal.MediaRecord(aid.toLong, s"t://$aid.warc", "application/warc",
        Warc.writeWarc(recs, gzipped = gz), Map.empty)
    }
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = Ingest.toWat(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("wat_stream_out").start()
    try {
      stream.addData(archives)
      q.processAllAvailable()
      val streamed = spark.table("wat_stream_out")
        .as[Multimodal.MediaRecord].collect().sortBy(_.media_id)
      val batch = Ingest.toWat(spark.createDataset(archives))
        .collect().sortBy(_.media_id)
      assert(streamed.length == 2)
      streamed.zip(batch).foreach { case (s1, b1) =>
        assert(s1.uri == b1.uri && s1.uri.endsWith(".wat"))
        assert(java.util.Arrays.equals(s1.content, b1.content),
          s"WAT bytes diverge for ${s1.uri}")
      }
    } finally q.stop()
  }

  test("streaming magic-routed document mining matches batch (the tx_doc_mine twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one archive carrying every container lane (ids 0-9 cover pdf, the
    // four office dialects, epub, rtf, and the three legacy binaries)
    val recs = (0L to 9L).map { id =>
      Map("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"http://src.invalid/doc/$id",
        "WARC-Record-ID" -> s"<urn:t:doc:$id>") ->
        Warc.httpResponse(200, "application/octet-stream", Ingest.docBody(id))
    }
    val archive = Multimodal.MediaRecord(0L, "t://docs.warc", "application/warc",
      Warc.writeWarc(recs, gzipped = true), Map.empty)
    def mine(ds: org.apache.spark.sql.Dataset[Ingest.WarcCapture]) = ds
      .filter(_.warc_type == "response")
      .map(c => Ingest.docMineRecord(c.url, c.body))
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = mine(Ingest.ingestWarc(stream.toDS()))
      .writeStream.outputMode("append").format("memory")
      .queryName("docmine_stream_out").start()
    try {
      stream.addData(Seq(archive))
      q.processAllAvailable()
      val streamed = spark.table("docmine_stream_out")
        .as[(Long, String, String, Long)].collect().sortBy(_._1)
      val batch = mine(Ingest.ingestWarc(spark.createDataset(Seq(archive))))
        .collect().sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
      assert(batch.map(_._2).toSeq == Seq("pdf", "docx", "odt", "xlsx",
        "pptx", "epub", "rtf", "doc", "xls", "ppt"))
      assert(batch.forall(_._3 == "ok"))
      assert(batch.forall(_._4 > 0))
    } finally q.stop()
  }

  test("streaming tar.xz member explode matches batch (stateless flatMap)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val archives = (0L to 1L).map { aid =>
      val entries = (aid * 4 until aid * 4 + 4).map { id =>
        val body = s"member $id — café".getBytes("UTF-8")
        graft.operators.Tar.TarEntry(s"src/$id.txt", body.length.toLong, '0', body)
      }
      Multimodal.MediaRecord(aid, s"t://a$aid.tar.xz", "application/x-xz",
        graft.operators.Xz.compress(graft.operators.Tar.writeTar(entries),
          if (aid % 2 == 0) "crc32" else "sha256"), Map.empty)
    }
    def mine(ds: org.apache.spark.sql.Dataset[Multimodal.MediaRecord]) = ds
      .flatMap { r =>
        graft.operators.Tar.readEntries(graft.operators.Xz.decompress(r.content))
          .map(e => (r.media_id, e.name, e.size))
      }
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = mine(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("tarxz_stream_out").start()
    try {
      stream.addData(archives)
      q.processAllAvailable()
      val streamed = spark.table("tarxz_stream_out")
        .as[(Long, String, Long)].collect().sortBy(_._2)
      val batch = mine(spark.createDataset(archives)).collect().sortBy(_._2)
      assert(streamed.toSeq == batch.toSeq)
      assert(batch.length == 8)
    } finally q.stop()
  }

  test("streaming wiki-dump shard explode matches batch (stateless flatMap)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val shards = (0L to 1L).map { sid =>
      // genuinely multistream shards (the real dump layout), so the
      // stream path exercises the concatenated-stream decode too
      val pages = (sid * 6 until sid * 6 + 6).map(Ingest.wikiPage)
      val (dump, _) = graft.operators.MediaWiki.writeMultistreamDump(pages)
      Multimodal.MediaRecord(sid, s"t://shard$sid.xml.bz2",
        "application/x-bzip2", dump, Map.empty)
    }
    def mine(ds: org.apache.spark.sql.Dataset[Multimodal.MediaRecord]) = ds
      .flatMap { r =>
        graft.operators.MediaWiki.parseDump(
          graft.operators.Bzip2.decompress(r.content))
          .map(p => (p.pageId, p.title,
            graft.operators.MediaWiki.cleanWikitext(p.wikitext)))
      }
    val stream = MemoryStream[Multimodal.MediaRecord]
    val q = mine(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("wiki_stream_out").start()
    try {
      shards.foreach { sh => stream.addData(Seq(sh)); q.processAllAvailable() }
      val streamed = spark.table("wiki_stream_out")
        .as[(Long, String, String)].collect().sortBy(_._1)
      val batch = mine(spark.createDataset(shards)).collect().sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
      assert(batch.length == 12 && batch.forall(_._3.nonEmpty))
    } finally q.stop()
  }
}
