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

    spark.stop()
  }
}
