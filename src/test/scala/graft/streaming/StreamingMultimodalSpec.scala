package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingMultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed top-k matches batch Misra-Gries on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // skewed stream: item popularity ~ 1/(i%7+1), two hourly windows
    val events = (0 until 3000).map { i =>
      val hour = if (i % 2 == 0) 10 else 11
      (new Timestamp(1700000000000L + hour * 3600000L + (i % 600) * 1000L),
        s"item${i % ((i % 7) + 3)}")
    }
    val stream = MemoryStream[(Timestamp, String)]
    val agg = StreamingHll.windowedTopK(
      stream.toDF().toDF("ts", "item"), "ts", "item", "1 hour", "10 minutes", k = 5)
    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName("topk_stream_out").start()
    try {
      events.grouped(1000).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("topk_stream_out")
        .select(col("window.start").cast("long").as("w"), to_json(col("top_k")).as("tk"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = events.toDF("ts", "item")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(graft.functions.GraftFunctions.approx_top_k(col("item"), 5).as("top_k"))
        .select(col("window.start").cast("long"), to_json(col("top_k")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed.keySet == batch.keySet && streamed.size == 2)
      streamed.foreach { case (w, tk) =>
        assert(tk == batch(w), s"window $w: streaming $tk != batch ${batch(w)}") }
    } finally query.stop()

    // per-group variant: one top-k per (window, parity-of-item)
    val stream2 = MemoryStream[(Timestamp, String)]
    val agg2 = StreamingHll.windowedTopK(
      stream2.toDF().toDF("ts", "item")
        .withColumn("grp", substring(col("item"), 5, 1).cast("int") % 2),
      "ts", "item", "1 hour", "10 minutes", k = 3, extraGroups = Seq("grp"))
    val q2 = agg2.writeStream.outputMode("complete")
      .format("memory").queryName("topk_grouped_out").start()
    try {
      stream2.addData(events)
      q2.processAllAvailable()
      val rows = spark.table("topk_grouped_out")
        .select(col("window.start").cast("long"), col("grp")).collect()
      assert(rows.length == 4, s"expected 2 windows x 2 groups, got ${rows.length}")
    } finally q2.stop()
  }

  test("streaming windowed HLL matches batch estimate on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = (0 until 5000).map { i =>
      // two 1-hour windows, user ids overlap across windows
      val hour = if (i % 2 == 0) 10 else 11
      (new Timestamp(1700000000000L + hour * 3600000L + (i % 600) * 1000L), s"u${i % 700}")
    }

    val stream = MemoryStream[(Timestamp, String)]
    val agg = StreamingHll.windowedDistinct(
      stream.toDF().toDF("ts", "user"), "ts", "user", "1 hour", "10 minutes", k = 1024)

    val query = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hll_stream_out")
      .start()
    try {
      // feed in three micro-batches to force incremental state merges
      events.grouped(2000).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("hll_stream_out")
        .select(col("window.start").cast("long").as("w"), col("approx_distinct"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      // batch reference over identical data with the identical aggregate
      val batch = events.toDF("ts", "user")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(graft.functions.GraftFunctions.hll_cardinality(col("user"), 1024).as("est"))
        .select(col("window.start").cast("long"), col("est"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      assert(streamed.keySet == batch.keySet)
      assert(streamed.size == 2)
      streamed.foreach { case (w, est) =>
        assert(est == batch(w), s"window $w: streaming $est != batch ${batch(w)}")
      }
    } finally query.stop()
  }

  test("windowed distinct equals batch under random bounded-late arrival orders") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // property: for ANY arrival order whose lateness stays inside the
    // watermark, the streamed windowed estimate equals the batch aggregate
    // bit-for-bit (the sketch monoid is order-insensitive; watermarking must
    // not drop in-horizon rows). Permutations: shuffle within 15-minute
    // blocks (max lateness 15 min) against a 30-minute watermark, then cut
    // into random micro-batch sizes — all from fixed seeds.
    val base = 1700000000000L
    val events = (0 until 4000).map { i =>
      val offsetMs = (i * 7919L) % 7200000L // spread over 2 hourly windows
      (new Timestamp(base + offsetMs), s"u${i % 900}")
    }
    val batch = events.toDF("ts", "user")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.GraftFunctions.hll_cardinality(col("user"), 1024).as("est"))
      .select(col("window.start").cast("long"), col("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(trial * 1000003L)
      val permuted = events.sortBy(_._1.getTime)
        .grouped(500) // 500 events x ~contiguous times ≈ <15 min span blocks
        .flatMap(block => rnd.shuffle(block)).toSeq
      val stream = MemoryStream[(Timestamp, String)]
      val agg = StreamingHll.windowedDistinct(
        stream.toDF().toDF("ts", "user"), "ts", "user", "1 hour", "30 minutes", k = 1024)
      val name = s"hll_perm_$trial"
      val q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
      try {
        var rest = permuted
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(1500)
          stream.addData(rest.take(n))
          q.processAllAvailable()
          rest = rest.drop(n)
        }
        val streamed = spark.table(name)
          .select(col("window.start").cast("long"), col("approx_distinct"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(streamed == batch, s"trial $trial: $streamed != $batch")
      } finally q.stop()
    }
  }

  test("streaming sketch output re-aggregates to the global estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = (0 until 3000).map { i =>
      (new Timestamp(1700000000000L + (i % 7200) * 1000L), s"v${i % 911}")
    }
    val stream = MemoryStream[(Timestamp, String)]
    val agg = StreamingHll.windowedSketch(
      stream.toDF().toDF("ts", "user"), "ts", "user", "30 minutes", "5 minutes", k = 1024)
    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream_sk").start()
    try {
      stream.addData(events)
      query.processAllAvailable()
      val reagg = spark.table("hll_stream_sk")
        .agg(graft.functions.GraftFunctions.hll_estimate(
          graft.functions.GraftFunctions.hll_union_agg(col("sketch"))).as("est"))
        .collect()(0).getDouble(0)
      val direct = events.toDF("ts", "user")
        .agg(graft.functions.GraftFunctions.hll_cardinality(col("user"), 1024).as("est"))
        .collect()(0).getDouble(0)
      assert(reagg == direct)
    } finally query.stop()
  }

  test("multimodal: per-partition batch decode with projected features") {
    val media = Multimodal.fakeMediaFromDocuments(spark, "/root/testdata/sf0.001")
      .repartition(5)
    val feats = Multimodal.decodeImages(media)
    val rows = feats.collect()
    assert(rows.length == 500)
    // dims follow the deterministic fabrication rule
    val r7 = rows.find(_.media_id == 7L).get
    assert(r7.width == 8 * 16 && r7.height == 8 * 16 && r7.channels == 3)
    // ahash is deterministic: re-decode gives identical hashes
    val again = Multimodal.decodeImages(media).collect()
    assert(rows.map(r => r.media_id -> r.ahash).toMap == again.map(r => r.media_id -> r.ahash).toMap)
  }

  test("multimodal: streaming media normalization (resample + features) is batch-equivalent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a micro-batched OGG-FLAC drop: the map-only normalize pipeline
    // (page demux -> FLAC decode -> 16 kHz resample -> WAV -> features)
    // must behave identically on a stream and on the same rows in batch
    val clips = (0L until 24L).map { id =>
      Multimodal.MediaRecord(id, s"s://$id.ogg", "audio/ogg",
        Multimodal.deterministicOgg(id, 8000 * ((id % 3) + 1).toInt,
          ((id % 5) + 1).toInt * 200, ((id % 2) + 1).toInt),
        Map.empty)
    }
    def normalize(ds: org.apache.spark.sql.Dataset[Multimodal.MediaRecord]) =
      Multimodal.decodeAudioFeatures(
        Multimodal.resampleAudio(ds, targetRate = 16000),
        () => new Multimodal.ImageIoDecoder)
    val stream = MemoryStream[Multimodal.MediaRecord]
    val query = normalize(stream.toDS()).writeStream.outputMode("append")
      .format("memory").queryName("media_norm_out").start()
    try {
      clips.grouped(8).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("media_norm_out")
        .as[Multimodal.AudioFeatures].collect().sortBy(_.media_id)
      val batch = normalize(spark.createDataset(clips)).collect().sortBy(_.media_id)
      assert(streamed.length == 24)
      assert(streamed.toSeq == batch.toSeq)
      streamed.foreach(f => assert(f.sample_rate == 16000))
    } finally query.stop()
  }

  test("multimodal: SAFE stages divert corrupt records under streaming, batch-equivalent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a crawl drop where every 5th clip is garbage: the streaming query
    // must SURVIVE every micro-batch, divert the bad rows with the stable
    // reason, and agree with the batch run row-for-row
    val clips = (0L until 20L).map { id =>
      val good = Multimodal.deterministicWav(id, 8000, 400, 1)
      Multimodal.MediaRecord(id, s"s://$id.wav", "audio/wav",
        if (id % 5 == 4) java.util.Arrays.copyOf(good, 9) else good, Map.empty)
    }
    def safe(ds: org.apache.spark.sql.Dataset[Multimodal.MediaRecord]) =
      Multimodal.resampleAudioSafe(ds, targetRate = 16000)
    val stream = MemoryStream[Multimodal.MediaRecord]
    val query = safe(stream.toDS()).writeStream.outputMode("append")
      .format("memory").queryName("media_safe_out").start()
    try {
      clips.grouped(5).foreach { chunk => // every micro-batch has a bad row
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("media_safe_out")
        .as[Multimodal.MediaOutcome].collect().sortBy(_.media_id)
      assert(streamed.length == 20)
      val (bad, good) = streamed.partition(_.error != null)
      assert(bad.map(_.media_id).toSeq == Seq(4L, 9L, 14L, 19L))
      assert(bad.forall(_.error == "undecodable_audio"))
      assert(bad.forall(_.meta.contains("error_class")))
      good.foreach { o =>
        val a = graft.operators.WavePcm.parseWav16(o.content)
        assert(a.sampleRate == 16000, s"survivor ${o.media_id} not resampled")
      }
      val batch = safe(spark.createDataset(clips)).collect().sortBy(_.media_id)
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.media_id == b.media_id && s.error == b.error &&
          java.util.Arrays.equals(s.content, b.content),
          s"stream/batch divergence at ${s.media_id}")
      }
    } finally query.stop()
  }

  test("multimodal: real ImageIO decode round-trips deterministic PNGs") {
    import graft.operators.Multimodal.{ImageIoDecoder, deterministicPng}
    val dec = new ImageIoDecoder
    // encode -> decode round trip recovers geometry for PNG and BMP
    val png = deterministicPng(seed = 42L, width = 20, height = 12)
    val f = dec.decodeImage(png)
    assert(f.width == 20 && f.height == 12 && f.channels == 3)
    // BMP via the same JVM writer: geometry survives a second codec
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    val fb = dec.decodeImage(baos.toByteArray)
    assert(fb.width == 20 && fb.height == 12)
    // the average hash is a pixel-content hash: same pixels same hash (even
    // across codecs — both are lossless), different pixels different hash
    assert(fb.ahash == f.ahash)
    assert(dec.decodeImage(deterministicPng(43L, 20, 12)).ahash != f.ahash)
    // non-image bytes are rejected, not mis-parsed
    intercept[IllegalArgumentException] {
      dec.decodeImage(Array.fill[Byte](32)(7))
    }
    // distributed path: per-partition decoder over the PNG demo corpus
    val media = Multimodal.pngMediaFromDocuments(spark, "/root/testdata/sf0.001")
      .repartition(5)
    val feats = Multimodal.decodeImages(media, () => new ImageIoDecoder).collect()
    assert(feats.length == 500)
    feats.foreach { r =>
      assert(r.width == ((r.media_id % 16) + 1) * 4)
      assert(r.height == ((r.media_id % 12) + 1) * 4)
      assert(r.channels == 3)
      assert(r.size_bytes > 0)
    }
  }

  test("multimodal: real javax.sound decode round-trips deterministic WAVs") {
    import graft.operators.Multimodal.{ImageIoDecoder, deterministicWav}
    val dec = new ImageIoDecoder
    val wav = deterministicWav(seed = 5L, sampleRate = 16000, nFrames = 400, channels = 2)
    val f = dec.decodeAudio(wav)
    assert(f.sampleRate == 16000 && f.channels == 2 && f.nFrames == 400)
    // triangle wave peaks at |(-500..501) * 16| / 32768; decoded PCM is
    // bit-exact, so peak/rms are deterministic across decodes
    assert(f.peak > 0.2 && f.peak <= 8016.0 / 32768.0)
    assert(f.rms > 0.0 && f.rms <= f.peak)
    assert(dec.decodeAudio(wav) == f)
    // non-audio bytes are rejected, not mis-parsed
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      dec.decodeAudio(Array.fill[Byte](64)(7))
    }
    // distributed path: per-partition decoder over the WAV demo corpus
    val media = Multimodal.wavMediaFromDocuments(spark, "/root/testdata/sf0.001")
      .repartition(5)
    val feats = Multimodal.decodeAudioFeatures(media, () => new ImageIoDecoder).collect()
    assert(feats.length == 500)
    feats.foreach { r =>
      assert(r.sample_rate == 8000 * ((r.media_id % 3) + 1))
      assert(r.channels == (r.media_id % 2) + 1)
      assert(r.n_frames == ((r.media_id % 25) + 1) * 200)
      assert(r.peak > 0.0 && r.rms > 0.0 && r.rms <= r.peak && r.peak <= 1.0)
      assert(r.size_bytes > 44) // RIFF header + payload
    }
  }

  test("multimodal: real MJPEG frame sampling decodes every Nth JPEG frame") {
    import graft.operators.Multimodal.{ImageIoDecoder, deterministicMjpeg}
    val dec = new ImageIoDecoder
    val clip = deterministicMjpeg(seed = 9L, width = 16, height = 16, nFrames = 5)
    // everyN=1 decodes all frames; everyN=2 frames 0,2,4
    val all = dec.sampleFrames(clip, everyN = 1).toSeq
    assert(all.length == 5)
    val sampled = dec.sampleFrames(clip, everyN = 2).toSeq
    assert(sampled.length == 3)
    assert(sampled == Seq(all(0), all(2), all(4)))
    // hashes are pixel-content hashes: deterministic across decodes, and
    // the frame formula varies pixels enough that not all hashes collide
    assert(dec.sampleFrames(clip, everyN = 1).toSeq == all)
    assert(all.distinct.length > 1)
    // non-JPEG payloads keep the stub chunking fallback
    val fake = Multimodal.fakeMediaBytes(4, 4, 3, 2, Array.fill[Byte](120)(3))
    assert(dec.sampleFrames(fake, everyN = 50).toSeq ==
      new Multimodal.StubDecoder().sampleFrames(fake, everyN = 50).toSeq)
    // EXIF-led frames (FF D8 FF E1 APP1, how cameras write JPEG) must take
    // the real-decode path, not the stub: splice an APP1 segment after each
    // frame's SOI and re-sample — same per-frame pixel hashes
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte, 0x00, 0x08,
      'E', 'x', 'i', 'f', 0x00, 0x00)
    def withApp1(mjpeg: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      var i = 0
      while (i < mjpeg.length) {
        out += mjpeg(i)
        if (i + 1 < mjpeg.length && mjpeg(i) == 0xff.toByte && mjpeg(i + 1) == 0xd8.toByte &&
          (i == 0 || i + 3 < mjpeg.length && mjpeg(i + 2) == 0xff.toByte)) {
          out += mjpeg(i + 1)
          out ++= app1
          i += 2
        } else i += 1
      }
      out.toArray
    }
    val exifClip = withApp1(clip)
    assert(exifClip.length == clip.length + 5 * app1.length)
    assert(dec.sampleFrames(exifClip, everyN = 1).toSeq == all,
      "EXIF-led frames fell off the real-decode path")
    // distributed path over the MJPEG demo corpus: sampled count follows
    // the deterministic frame-count rule
    val media = Multimodal.mjpegMediaFromDocuments(spark, "/root/testdata/sf0.001")
      .repartition(5)
    val byId = Multimodal.sampleFrames(media, everyN = 2, () => new ImageIoDecoder)
      .collect().groupBy(_.media_id)
    assert(byId.size == 500)
    byId.foreach { case (id, fs) =>
      val expected = math.ceil(((id % 8) + 2).toDouble / 2).toInt
      assert(fs.length == expected, s"doc $id: ${fs.length} sampled != $expected")
    }
  }

  test("multimodal: AVI container demux matches the raw-MJPEG path frame-for-frame") {
    import graft.operators.{AviMjpeg, Multimodal}
    import graft.operators.Multimodal.{ImageIoDecoder, deterministicAvi, deterministicMjpeg}
    val dec = new ImageIoDecoder
    // same deterministic frames, two containers -> identical hashes
    val avi = deterministicAvi(seed = 9L, width = 16, height = 16, nFrames = 5)
    val raw = deterministicMjpeg(seed = 9L, width = 16, height = 16, nFrames = 5)
    assert(AviMjpeg.isAvi(avi) && !AviMjpeg.isAvi(raw))
    val fromAvi = dec.sampleFrames(avi, everyN = 1).toSeq
    val fromRaw = dec.sampleFrames(raw, everyN = 1).toSeq
    assert(fromAvi.length == 5)
    assert(fromAvi == fromRaw, "container demux diverged from raw MJPEG split")
    assert(dec.sampleFrames(avi, everyN = 2).toSeq == Seq(fromAvi(0), fromAvi(2), fromAvi(4)))
    // demuxer recovers the exact JPEG payloads (SOI-headed, byte-identical
    // to what the writer was given), honoring odd-size chunk padding
    val frames = (0 until 5).map(f => deterministicMjpeg(9L + f * 97L, 16, 16, 1))
    assert(frames.exists(_.length % 2 == 1), "fixture should include an odd-size frame")
    val demuxed = AviMjpeg.demuxFrames(AviMjpeg.writeAvi(frames, 16, 16)).toSeq
    assert(demuxed.map(_.toSeq) == frames.map(_.toSeq))
    // truncated file: yields the frames that fully landed, cleanly
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - avi.length / 4)
    val partial = dec.sampleFrames(cut, everyN = 1).toSeq
    assert(partial.length < 5 && partial == fromAvi.take(partial.length))
    // garbage that merely claims RIFF: no frames, no throw
    val junk = "RIFF\u0000\u0000\u0000\u0000AVI not actually a file".getBytes
    assert(AviMjpeg.demuxFrames(junk).isEmpty)
    // a non-JPEG ##db frame chunk hashes by FNV instead of failing the row
    val mixed = AviMjpeg.writeAvi(frames :+ Array.fill[Byte](33)(7), 16, 16)
    val mixedHashes = dec.sampleFrames(mixed, everyN = 1).toSeq
    assert(mixedHashes.length == 6 && mixedHashes.take(5) == fromAvi)
  }

  test("multimodal: decode runs under Structured Streaming (same seam, same results)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the per-partition decoder lifecycle must work inside micro-batches:
    // stream MediaRecords through the SAME decodeImages operator and expect
    // byte-identical features to the batch pass
    val records = (0L until 40L).map { id =>
      Multimodal.MediaRecord(id, s"mem://$id.png", "image/png",
        Multimodal.deterministicPng(id, ((id % 6) + 1).toInt * 4, ((id % 4) + 1).toInt * 4),
        Map.empty)
    }
    val stream = MemoryStream[Multimodal.MediaRecord]
    val decoded = Multimodal.decodeImages(stream.toDS(),
      () => new Multimodal.ImageIoDecoder)
    val q = decoded.writeStream.outputMode("append")
      .format("memory").queryName("mm_stream_out").start()
    try {
      records.grouped(15).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("mm_stream_out").as[Multimodal.ImageFeatures]
        .collect().map(f => f.media_id -> f).toMap
      val batch = Multimodal.decodeImages(records.toDS(),
        () => new Multimodal.ImageIoDecoder).collect().map(f => f.media_id -> f).toMap
      assert(streamed == batch)
      assert(streamed.size == 40)
    } finally q.stop()
  }

  test("multimodal: frame sampling yields one row per chunk") {
    val media = Multimodal.fakeMediaFromDocuments(spark, "/root/testdata/sf0.001")
    val frames = Multimodal.sampleFrames(media, everyN = 50)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId.size == 500)
    // frame count = ceil(payload/50); payload = n_chars (ASCII text)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.foreach { case (id, fs) =>
      val expected = math.ceil(docs(id).toDouble / 50).toInt
      assert(fs.length == expected, s"doc $id: ${fs.length} frames != $expected")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
    }
  }
}
