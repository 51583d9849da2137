package graftdrive

import org.apache.spark.sql.SparkSession

/** Round-8 stress numbers (recorded in BASELINE.md): triage-probe and
  * archive-ingest throughput at corpus scale. Run:
  * `sbt 'Test/runMain graftdrive.StressDriveR8'` on a quiet host.
  */
object StressDriveR8 {
  // object-level so the map closure captures no driver locals (the
  // Multimodal module is reached as a static MODULE$ field, not serialized)
  private def mixed(id: Long): graft.operators.Multimodal.MediaRecord = {
    val mm = graft.operators.Multimodal
    val q = id / 10
    val bytes = (id % 10) match {
      case 0 => mm.deterministicPng(q, 16, 16)
      case 1 => mm.deterministicMjpeg(q, 16, 16, 1)
      case 2 => mm.deterministicWav(q, 16000, 400, 1)
      case 3 => mm.deterministicFlacCompressed(q, 16000, 400, 1)
      case 4 => mm.deterministicOgg(q, 16000, 400, 1)
      case 5 => mm.deterministicMp3(q)
      case 6 => mm.deterministicVorbisIdOgg(q, 16000, 1)
      case 7 => mm.deterministicAvi(q, 16, 16, 2)
      case 8 => mm.deterministicMp4(q, 16, 16, 2)
      case _ => mm.deterministicMkv(q, 16, 16, 2, "webm")
    }
    graft.operators.Multimodal.MediaRecord(id, s"s://$id", "x", bytes, Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val mm = graft.operators.Multimodal

    // 1) mixed-media triage probe, generate+probe end-to-end: 300k records
    //    across all ten families (the generation cost is real media
    //    encoding, so the pure probe rate is strictly higher)
    val nProbe = 300000L
    val probeIn = spark.range(nProbe).repartition(64)
      .map((r: java.lang.Long) => StressDriveR8.mixed(r.longValue)).cache()
    val genBytes = probeIn.map(_.content.length.toLong).reduce(_ + _) // materialize
    mm.probeMedia(probeIn).filter(_.container.nonEmpty).count() // warm: codegen+JIT
    val t0 = System.nanoTime()
    val probed = mm.probeMedia(probeIn).groupByKey(_.container).count().collect()
    val t1 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE probe-300k-mixed: $t1%.1f s = ${nProbe / t1 / 1e3}%.0f K rec/s, " +
      f"${genBytes / t1 / 1e6}%.0f MB/s over cached corpus " +
      s"(${genBytes / 1024 / 1024} MiB; containers=${probed.sortBy(_._1).mkString(",")})")
    probeIn.unpersist()

    // 2) pure MP3 frame-walk rate, single core: pre-generated clips,
    //    header walk only (what the probe adds on top of I/O)
    val clips = (0L until 20000L).map(mm.deterministicMp3).toArray
    val t2a = System.nanoTime()
    var frames = 0L
    clips.foreach(c => frames += graft.operators.Mp3Frames.probe(c).frameCount)
    val t2 = (System.nanoTime() - t2a) / 1e9
    println(f"DRIVE mp3-walk-20k-1core: $t2%.2f s = ${clips.length / t2 / 1e3}%.0f K clips/s " +
      f"(${frames / t2 / 1e6}%.1f M frames/s, ${clips.map(_.length.toLong).sum / t2 / 1e6}%.0f MB/s)")

    // 3) WARC explode: 2000 archives x 50 captures x ~1 KiB bodies
    //    (~130 MiB of archive bytes), counting exploded captures
    val nArch = 2000L
    val warcs = spark.range(nArch).repartition(64).map { aid =>
      val recs = (0 until 50).map { i =>
        val id = aid * 50 + i
        Map("WARC-Type" -> "response", "WARC-Target-URI" -> s"http://x.invalid/$id",
          "WARC-Record-ID" -> s"<urn:s:$id>") ->
          graft.operators.Warc.httpResponse(200, "text/plain",
            (s"doc $id " * 128).getBytes("UTF-8"))
      }
      graft.operators.Multimodal.MediaRecord(aid, s"s://$aid.warc", "application/warc",
        graft.operators.Warc.writeWarc(recs, gzipped = aid % 2 == 1), Map.empty)
    }.cache()
    val warcBytes = warcs.map(_.content.length.toLong).reduce(_ + _)
    val t3a = System.nanoTime()
    val captures = graft.operators.Ingest.ingestWarc(warcs).count()
    val t3 = (System.nanoTime() - t3a) / 1e9
    println(f"DRIVE warc-explode-2000x50: $t3%.1f s = ${captures / t3 / 1e3}%.0f K captures/s, " +
      f"${warcBytes / t3 / 1e6}%.0f MB/s archive bytes (half gzipped; captures=$captures)")
    warcs.unpersist()

    // 4) tar explode: same shape, 2000 archives x 50 members
    val tars = spark.range(nArch).repartition(64).map { aid =>
      val entries = (0 until 50).map { i =>
        val body = (s"member ${aid * 50 + i} " * 64).getBytes("UTF-8")
        graft.operators.Tar.TarEntry(s"d$aid/m$i.txt", body.length.toLong, '0', body)
      }
      graft.operators.Multimodal.MediaRecord(aid, s"s://$aid.tar", "application/x-tar",
        graft.operators.Tar.writeTar(entries), Map.empty)
    }.cache()
    val tarBytes = tars.map(_.content.length.toLong).reduce(_ + _)
    val t4a = System.nanoTime()
    val members = graft.operators.Ingest.ingestTar(tars).count()
    val t4 = (System.nanoTime() - t4a) / 1e9
    println(f"DRIVE tar-explode-2000x50: $t4%.1f s = ${members / t4 / 1e3}%.0f K members/s, " +
      f"${tarBytes / t4 / 1e6}%.0f MB/s (members=$members)")
    tars.unpersist()

    // 5) the crawl-scan scalars: url_normalize and robots_allowed over
    //    10M messy URLs (codegen'd map-only projections — the rate they
    //    ride a 100 TB scan at), robots via the host-grain broadcast join
    import org.apache.spark.sql.functions._
    val nUrl = 10000000L
    val urls = spark.range(nUrl).select(
        concat(lit("HTTP://Host"), col("id") % 1000, lit(".INVALID:80/p/"),
          col("id"), lit("?utm_source=x&b=2&a=1#f")).as("url_raw"),
        concat(lit("host"), col("id") % 1000, lit(".invalid")).as("host"),
        concat(lit("/p/"), col("id")).as("path"))
      .localCheckpoint()
    val t5a = System.nanoTime()
    urls.select(graft.operators.TextAnalysis.urlNormalize(col("url_raw")).as("u"))
      .write.format("noop").mode("overwrite").save()
    val t5 = (System.nanoTime() - t5a) / 1e9
    println(f"DRIVE url-normalize-10M: $t5%.1f s = ${nUrl / t5 / 1e6}%.1f M urls/s")
    val robotsTxt = "User-agent: graftbot\nDisallow: /private/\nAllow: /private/open/\n" +
      "Disallow: /*.tmp$\n\nUser-agent: *\nDisallow: /\n"
    val robotsDim = spark.range(1000).select(
      concat(lit("host"), col("id"), lit(".invalid")).as("host"),
      lit(robotsTxt).as("robots_txt"))
    val t6a = System.nanoTime()
    urls.join(broadcast(robotsDim), Seq("host"))
      .select(graft.operators.TextAnalysis.robotsAllowed(
        col("robots_txt"), lit("graftbot"), col("path")).as("ok"))
      .write.format("noop").mode("overwrite").save()
    val t6 = (System.nanoTime() - t6a) / 1e9
    println(f"DRIVE robots-gate-10M: $t6%.1f s = ${nUrl / t6 / 1e6}%.1f M urls/s " +
      "(broadcast join + per-thread parse memo)")
    urls.unpersist()

    // 6) charset decode: 1M ~1 KiB bodies across the five construction
    //    shapes (both BOMs, declared latin-1, bare utf-8, invalid utf-8)
    val nBody = 1000000L
    val bodies = spark.range(nBody).map { id =>
      val text = s"body $id " * 128
      (id % 5) match {
        case 0 => (Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ text.getBytes("UTF-8"), "text/html")
        case 1 => (Array(0xff, 0xfe).map(_.toByte) ++ text.getBytes("UTF-16LE"), "text/html")
        case 2 => (text.getBytes("ISO-8859-1"), "text/html; charset=ISO-8859-1")
        case 3 => (text.getBytes("UTF-8"), "text/html")
        case _ => (text.getBytes("UTF-8") ++ Array(0x80, 0x81).map(_.toByte), "text/html")
      }
    }.toDF("body", "ct").localCheckpoint()
    val bodyBytes = bodies.select(sum(length(col("body")))).collect()(0).getLong(0)
    val t7a = System.nanoTime()
    bodies.as[(Array[Byte], String)]
      .map(r => graft.operators.Charsets.decode(r._1, r._2).text.length)
      .write.format("noop").mode("overwrite").save()
    val t7 = (System.nanoTime() - t7a) / 1e9
    println(f"DRIVE charset-decode-1M: $t7%.1f s = ${nBody / t7 / 1e6}%.2f M bodies/s, " +
      f"${bodyBytes / t7 / 1e6}%.0f MB/s")

    spark.stop()
  }
}
