package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC + OGG codec properties: lossless round-trips across geometries,
  * multi-block frame numbering, OGG lacing edge cases (255-multiples,
  * continuation pages), and the integrity checks actually biting on
  * corruption — the audio siblings of AviMjpeg/IsoBmff/MatroskaProperties.
  */
class FlacOggPropertiesSpec extends AnyFunSuite {

  private def pcm(seed: Long, frames: Int, channels: Int): Array[Byte] =
    Multimodal.deterministicPcm(seed, frames, channels)

  test("flac: encode/decode round-trips the PCM bit-for-bit across geometries") {
    for {
      channels <- Seq(1, 2)
      frames <- Seq(0, 1, 16, 1000, 1024, 1025)
      seed <- Seq(0L, 7L)
    } {
      val raw = pcm(seed, frames, channels)
      val flac = FlacCodec.writeFlac(raw, 16000, channels)
      val dec = FlacCodec.decodeFlac(flac)
      assert(dec.sampleRate == 16000 && dec.channels == channels)
      assert(dec.totalFrames == frames.toLong)
      assert(java.util.Arrays.equals(dec.pcmLE, raw),
        s"PCM mismatch at channels=$channels frames=$frames seed=$seed")
    }
  }

  test("flac: FIXED mode round-trips bit-for-bit across geometries and stereo modes") {
    import FlacCodec.{Mode, Stereo}
    for {
      channels <- Seq(1, 2)
      frames <- Seq(0, 1, 16, 1000, 4096, 4097)
      seed <- Seq(0L, 7L)
    } {
      val raw = pcm(seed, frames, channels)
      val flac = FlacCodec.writeFlacFixed(raw, 16000, channels)
      val dec = FlacCodec.decodeFlac(flac) // MD5-verifies internally
      assert(dec.sampleRate == 16000 && dec.channels == channels)
      assert(java.util.Arrays.equals(dec.pcmLE, raw),
        s"FIXED PCM mismatch at channels=$channels frames=$frames seed=$seed")
    }
    // every stereo assignment decodes — forced, so none hides behind Auto
    val raw2 = pcm(13L, 3000, 2)
    for (st <- Seq(Stereo.Independent, Stereo.LeftSide, Stereo.RightSide, Stereo.MidSide)) {
      val flac = FlacCodec.writeFlac(raw2, 24000, 2, 1024, Mode.Fixed, st)
      assert(java.util.Arrays.equals(FlacCodec.decodeFlac(flac).pcmLE, raw2),
        s"stereo mode $st mismatch")
    }
  }

  test("flac: LPC mode round-trips and actually emits LPC subframes") {
    import FlacCodec.Mode
    for (channels <- Seq(1, 2); frames <- Seq(3, 1000, 2048)) {
      val raw = pcm(5L, frames, channels)
      val flac = FlacCodec.writeFlac(raw, 16000, channels, 1024, Mode.Lpc)
      assert(java.util.Arrays.equals(FlacCodec.decodeFlac(flac).pcmLE, raw),
        s"LPC PCM mismatch at channels=$channels frames=$frames")
    }
    // the verbatim decoder rejected type>=32; prove the stream really
    // carries LPC by checking a subframe header byte: first frame of a mono
    // stream, subframe header directly after the 5-byte frame header
    // (ff f8 70 xx bs bs crc8) -> byte offset 4+34+4+3+2+... use marker scan
    val mono = FlacCodec.writeFlac(pcm(5L, 1000, 1), 16000, 1, 1024, Mode.Lpc)
    // frame starts right after fLaC + 38-byte STREAMINFO block
    val frameStart = 4 + 38
    assert((mono(frameStart) & 0xff) == 0xff && (mono(frameStart + 1) & 0xff) == 0xf8)
    // header: 4 fixed + 1 frame-number + 2 blockSize + 1 crc8 -> subframe at +8
    val subHeader = mono(frameStart + 8) & 0xff
    assert((subHeader >> 1) >= 32, s"expected an LPC subframe type, got header $subHeader")
  }

  test("flac: FIXED mode genuinely compresses the deterministic corpus") {
    val raw = pcm(9L, 5000, 2)
    val verbatim = FlacCodec.writeFlac(raw, 16000, 2)
    val fixed = FlacCodec.writeFlacFixed(raw, 16000, 2)
    assert(fixed.length < verbatim.length / 2,
      s"FIXED ${fixed.length} B vs verbatim ${verbatim.length} B — predictor not biting")
  }

  test("flac: decode-only paths — Rice2, partitioned residuals, escape partition, wasted bits") {
    // hand-built mono frame the encoder never emits: FIXED order 1, 2 wasted
    // bits, partition order 1 (2 partitions), Rice2 coding, second partition
    // escaped to 5-bit raw residuals
    final class BW {
      val out = new java.io.ByteArrayOutputStream()
      private var cur = 0; private var n = 0
      def bits(v: Long, w: Int): Unit = { var i = w - 1; while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }; i -= 1 } }
      def align(): Unit = if (n != 0) bits(0, 8 - n)
    }
    val bs = 16
    // residuals (zigzag-small for partition 0; partition 1 raw 5-bit signed)
    val res = Array(0, 1, -1, 2, -2, 3, -3, 7, -8, 15, -15, 4, -4, 0, 5, -5)
    val warm0 = 100 // first sample in the width-14 domain
    val samples14 = new Array[Int](bs)
    samples14(0) = warm0
    for (i <- 1 until bs) samples14(i) = res(i) + samples14(i - 1) // order-1 reconstruction
    val expected = samples14.map(_ << 2) // wasted = 2
    val pcmBytes = new Array[Byte](bs * 2)
    for (i <- 0 until bs) {
      pcmBytes(2 * i) = (expected(i) & 0xff).toByte
      pcmBytes(2 * i + 1) = ((expected(i) >> 8) & 0xff).toByte
    }
    val w = new BW
    // frame header: sync+reserved+fixed-blocking, bs code 7 (u16), rate 0,
    // chan 0 (mono), bps 4 (16-bit), reserved
    w.bits(0x3ffe, 14); w.bits(0, 2); w.bits(7, 4); w.bits(0, 4)
    w.bits(0, 4); w.bits(4, 3); w.bits(0, 1)
    w.bits(0, 8) // frame number 0
    w.bits(bs - 1, 16)
    val headBytes = w.out.toByteArray
    w.bits(FlacCodec.crc8(headBytes, 0, headBytes.length).toLong, 8)
    // subframe: pad 0, FIXED order 1 (001001), wasted flag 1 + unary "01" (=2)
    w.bits(0, 1); w.bits(9, 6); w.bits(1, 1); w.bits(1, 2) // unary 0b01
    w.bits(warm0.toLong & 0x3fff, 14) // warmup at width 14
    // residual: method 1 (Rice2), partition order 1
    w.bits(1, 2); w.bits(1, 4)
    // partition 0: 7 residuals (psize 8 minus order 1), Rice2 param 2
    w.bits(2, 5)
    for (i <- 1 until 8) {
      val u = ((res(i).toLong << 1) ^ (res(i).toLong >> 63))
      var q = (u >>> 2).toInt
      while (q > 0) { w.bits(0, 1); q -= 1 }
      w.bits(1, 1); w.bits(u & 3, 2)
    }
    // partition 1: escape (31), raw width 5
    w.bits(31, 5); w.bits(5, 5)
    for (i <- 8 until 16) w.bits(res(i).toLong & 0x1f, 5)
    w.align()
    val soFar = w.out.toByteArray
    w.bits(FlacCodec.crc16(soFar, 0, soFar.length).toLong, 16)
    val frame = w.out.toByteArray
    val (si, _) = FlacCodec.encodeParts(pcmBytes, 8000, 1, blockSize = 16)
    val stream = new java.io.ByteArrayOutputStream()
    stream.write('f'); stream.write('L'); stream.write('a'); stream.write('C')
    stream.write(si); stream.write(frame)
    val dec = FlacCodec.decodeFlac(stream.toByteArray) // MD5 verifies too
    assert(java.util.Arrays.equals(dec.pcmLE, pcmBytes),
      "hand-built Rice2/escape/wasted frame decoded wrong")
  }

  test("flac: wild LPC decode — orders 1/2/4/8/12/32, random coefficients, precisions 1-15, shifts 0-15") {
    // the engine's own encoder emits only order-2 (32,-16)@shift-4 LPC, so
    // the general predictor loop (arbitrary quantized coefficients, any
    // precision code, any shift, orders > 2) is pinned here with hand-built
    // decode-only frames: residuals are computed BACKWARD from the desired
    // samples through an independent reimplementation of the predictor, so
    // decode must reproduce the samples exactly (and pass STREAMINFO-MD5)
    final class BW {
      val out = new java.io.ByteArrayOutputStream()
      private var cur = 0; private var n = 0
      def bits(v: Long, w: Int): Unit = { var i = w - 1; while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }; i -= 1 } }
      def align(): Unit = if (n != 0) bits(0, 8 - n)
    }
    val rnd = new scala.util.Random(421)
    val bs = 64
    for (order <- Seq(1, 2, 4, 8, 12, 32); trial <- 0 until 3) {
      val precision = 1 + rnd.nextInt(15) // 1..15 -> precision code 0..14
      val shift = rnd.nextInt(16) // 0..15 (5-bit non-negative)
      val coefs = Array.fill(order)(rnd.nextInt(1 << precision) - (1 << (precision - 1)))
      val samples = Array.fill(bs)(rnd.nextInt(201) - 100)
      // independent predictor model: res(i) = s(i) - ((sum coef*past) >> shift)
      val res = new Array[Int](bs)
      for (i <- order until bs) {
        var sum = 0L
        for (j <- 0 until order) sum += coefs(j).toLong * samples(i - 1 - j)
        res(i) = samples(i) - (sum >> shift).toInt
      }
      var rawW = 1
      for (i <- order until bs) {
        val v = res(i)
        while (v < -(1 << (rawW - 1)) || v > (1 << (rawW - 1)) - 1) rawW += 1
      }
      require(rawW <= 31)
      val pcmBytes = new Array[Byte](bs * 2)
      for (i <- 0 until bs) {
        pcmBytes(2 * i) = (samples(i) & 0xff).toByte
        pcmBytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val w = new BW
      // frame header: mono, 16-bit, bs code 7 (u16), rate from STREAMINFO
      w.bits(0x3ffe, 14); w.bits(0, 2); w.bits(7, 4); w.bits(0, 4)
      w.bits(0, 4); w.bits(4, 3); w.bits(0, 1)
      w.bits(0, 8) // frame number 0
      w.bits(bs - 1, 16)
      val headBytes = w.out.toByteArray
      w.bits(FlacCodec.crc8(headBytes, 0, headBytes.length).toLong, 8)
      // subframe header: pad 0, 6-bit LPC type 1ooooo (o = order-1), wasted 0
      w.bits(0, 1); w.bits(32L | (order - 1), 6); w.bits(0, 1)
      for (i <- 0 until order) w.bits(samples(i).toLong & 0xffff, 16) // warmup
      w.bits((precision - 1).toLong, 4)
      w.bits(shift.toLong, 5)
      for (c <- coefs) w.bits(c.toLong & ((1L << precision) - 1), precision)
      // residual: method 0 (Rice 4-bit), partition order 0, escape to raw
      w.bits(0, 2); w.bits(0, 4)
      w.bits(15, 4); w.bits(rawW.toLong, 5)
      for (i <- order until bs) w.bits(res(i).toLong & ((1L << rawW) - 1), rawW)
      w.align()
      val soFar = w.out.toByteArray
      w.bits(FlacCodec.crc16(soFar, 0, soFar.length).toLong, 16)
      val frame = w.out.toByteArray
      val (si, _) = FlacCodec.encodeParts(pcmBytes, 8000, 1, blockSize = bs)
      val stream = new java.io.ByteArrayOutputStream()
      stream.write('f'); stream.write('L'); stream.write('a'); stream.write('C')
      stream.write(si); stream.write(frame)
      val dec = FlacCodec.decodeFlac(stream.toByteArray) // STREAMINFO-MD5 verifies
      assert(java.util.Arrays.equals(dec.pcmLE, pcmBytes),
        s"wild LPC decode wrong at order=$order precision=$precision shift=$shift trial=$trial")
    }
  }

  test("flac: FIXED-mode corruption anywhere dies in a require, never wrong PCM") {
    val raw = pcm(17L, 2000, 2)
    val good = FlacCodec.writeFlacFixed(raw, 24000, 2)
    val rnd = new scala.util.Random(7)
    var caught = 0
    for (_ <- 0 until 300) {
      val bad = good.clone()
      val i = rnd.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val dec = FlacCodec.decodeFlac(bad)
        assert(java.util.Arrays.equals(dec.pcmLE, raw),
          s"byte $i: undetected corruption CHANGED the decoded PCM")
      } catch { case _: IllegalArgumentException => caught += 1 }
    }
    assert(caught > 250, s"only $caught/300 corruptions caught — integrity checks not biting")
  }

  test("flac: multi-block streams exercise multi-byte frame numbers") {
    // blockSize 16 over 2400 frames -> 150 frames, numbers past 0x7F use
    // the 2-byte UTF-8-style coding
    val raw = pcm(3L, 2400, 1)
    val (si, frames) = FlacCodec.encodeParts(raw, 8000, 1, blockSize = 16)
    assert(frames.length == 150)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(si); frames.foreach(out.write)
    val dec = FlacCodec.decodeFlac(out.toByteArray)
    assert(java.util.Arrays.equals(dec.pcmLE, raw))
  }

  test("flac: corruption anywhere dies in a require (CRC/MD5/structure), never wrong PCM") {
    val raw = pcm(11L, 500, 2)
    val good = FlacCodec.writeFlac(raw, 24000, 2)
    val rnd = new scala.util.Random(42)
    var caught = 0
    for (_ <- 0 until 300) {
      val bad = good.clone()
      val i = rnd.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val dec = FlacCodec.decodeFlac(bad)
        // a flip the checks cannot see must at least leave the PCM intact
        // (e.g. a bit inside the unvalidated min/max-frame-size fields)
        assert(java.util.Arrays.equals(dec.pcmLE, raw),
          s"byte $i: undetected corruption CHANGED the decoded PCM")
      } catch { case _: IllegalArgumentException => caught += 1 }
    }
    assert(caught > 250, s"only $caught/300 corruptions caught — integrity checks not biting")
  }

  test("ogg: page round-trip incl. 255-multiple packets and continuation pages") {
    val rnd = new scala.util.Random(9)
    val packets = Seq(
      Array.fill(10)(rnd.nextInt().toByte),
      Array.fill(255)(rnd.nextInt().toByte),      // forces the 0-lacing terminator
      Array.fill(510)(rnd.nextInt().toByte),      // two full segments
      Array.fill(70000)(rnd.nextInt().toByte),    // > 255 segments -> continuation page
      Array.emptyByteArray,                       // zero-length packet
      Array.fill(3)(rnd.nextInt().toByte))
    val ogg = OggStream.writePages(packets, serial = 123)
    val back = OggStream.readPackets(ogg)
    assert(back.length == packets.length)
    packets.zip(back).zipWithIndex.foreach { case ((a, b), i) =>
      assert(java.util.Arrays.equals(a, b), s"packet $i mismatch")
    }
  }

  test("ogg: page corruption dies in the CRC require") {
    val packets = Seq(pcm(1L, 300, 1), pcm(2L, 300, 1))
    val good = OggStream.writePages(packets, serial = 7)
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x10).toByte
    val e = intercept[IllegalArgumentException](OggStream.readPackets(bad))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("capture"))
  }

  test("ogg: losing or duplicating a whole page dies in the sequence require") {
    // 5 packets, each on its own page (writePages starts a fresh page per
    // packet), every page individually CRC-valid — only sequence continuity
    // can catch a missing/doubled page
    val packets = (0 until 5).map(i => Array.fill(40)((i * 7 + 1).toByte))
    val good = OggStream.writePages(packets, serial = 99)
    def pageBounds(b: Array[Byte]): Seq[(Int, Int)] = {
      var p = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (p < b.length) {
        val segs = b(p + 26) & 0xff
        var pay = 0
        for (i <- 0 until segs) pay += b(p + 27 + i) & 0xff
        val end = p + 27 + segs + pay
        out += ((p, end))
        p = end
      }
      out.toSeq
    }
    val bounds = pageBounds(good)
    assert(bounds.length == 5)
    // drop page 2
    val (s2, e2) = bounds(2)
    val dropped = java.util.Arrays.copyOfRange(good, 0, s2) ++
      java.util.Arrays.copyOfRange(good, e2, good.length)
    val e = intercept[IllegalArgumentException](OggStream.readPackets(dropped))
    assert(e.getMessage.contains("sequence"), s"wrong failure: $e")
    // duplicate page 2
    val doubled = java.util.Arrays.copyOfRange(good, 0, e2) ++
      java.util.Arrays.copyOfRange(good, s2, good.length)
    val e2x = intercept[IllegalArgumentException](OggStream.readPackets(doubled))
    assert(e2x.getMessage.contains("sequence"), s"wrong failure: $e2x")
    // splicing in a page from ANOTHER stream (valid CRC, right sequence)
    // dies in the serial require
    val other = OggStream.writePages(packets, serial = 42)
    val ob = pageBounds(other)(2)
    val spliced = java.util.Arrays.copyOfRange(good, 0, s2) ++
      java.util.Arrays.copyOfRange(other, ob._1, ob._2) ++
      java.util.Arrays.copyOfRange(good, e2, good.length)
    val e3 = intercept[IllegalArgumentException](OggStream.readPackets(spliced))
    assert(e3.getMessage.contains("serial"), s"wrong failure: $e3")
  }

  test("ogg: non-FLAC codecs are identified and rejected BY NAME") {
    // minimal page-0 shapes: one page, one small identification packet
    def page0(packet: Array[Byte]): Array[Byte] =
      OggStream.writePages(Seq(packet), serial = 1)
    val vorbis = page0(Array[Byte](0x01) ++ "vorbis".getBytes ++ new Array[Byte](20))
    val opus = page0("OpusHead".getBytes ++ new Array[Byte](10))
    val theora = page0(Array[Byte](0x80.toByte) ++ "theora".getBytes ++ new Array[Byte](20))
    val speex = page0("Speex   ".getBytes ++ new Array[Byte](20))
    assert(OggStream.identifyCodec(vorbis) == "vorbis")
    assert(OggStream.identifyCodec(opus) == "opus")
    assert(OggStream.identifyCodec(theora) == "theora")
    assert(OggStream.identifyCodec(speex) == "speex")
    assert(OggStream.identifyCodec(
      OggStream.writeOggFlac(pcm(1L, 100, 1), 8000, 1)) == "flac")
    assert(OggStream.identifyCodec(page0(Array[Byte](1, 2, 3))) == "unknown")
    // decodePcm16 names the codec in its reject instead of a generic probe
    val e = intercept[IllegalArgumentException](Multimodal.decodePcm16(vorbis))
    assert(e.getMessage.contains("vorbis"), s"codec not named: $e")
    val e2 = intercept[IllegalArgumentException](Multimodal.decodePcm16(opus))
    assert(e2.getMessage.contains("opus"), s"codec not named: $e2")
  }

  test("ogg-flac: container round-trip matches the native flac decode exactly") {
    for (channels <- Seq(1, 2)) {
      val raw = pcm(21L, 3000, channels)
      val ogg = OggStream.writeOggFlac(raw, 16000, channels)
      assert(OggStream.isOggFlac(ogg))
      assert(!FlacCodec.isFlac(ogg))
      val dec = FlacCodec.decodeFlac(OggStream.extractFlac(ogg))
      assert(dec.channels == channels && dec.sampleRate == 16000)
      assert(java.util.Arrays.equals(dec.pcmLE, raw))
    }
  }

  test("wav: WavePcm and javax.sound agree in BOTH directions") {
    for ((seed, rate, frames, channels) <- Seq((1L, 8000, 700, 1), (2L, 24000, 1024, 2))) {
      val raw = pcm(seed, frames, channels)
      // our bytes through AudioSystem
      val ours = WavePcm.writeWav16(raw, rate, channels)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(ours))
      try {
        assert(in.getFormat.getSampleRate.toInt == rate)
        assert(in.getFormat.getChannels == channels)
        assert(in.getFrameLength == frames.toLong)
        assert(java.util.Arrays.equals(in.readAllBytes(), raw))
      } finally in.close()
      // AudioSystem's bytes through our parser
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, frames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      val theirs = WavePcm.parseWav16(baos.toByteArray)
      assert(theirs.sampleRate == rate && theirs.channels == channels &&
        theirs.nFrames == frames.toLong)
      assert(java.util.Arrays.equals(theirs.pcmLE, raw))
      // and for this canonical format the bytes are in fact identical
      assert(java.util.Arrays.equals(ours, baos.toByteArray),
        "WavePcm header diverges from AudioSystem's canonical WAVE layout")
    }
  }

  test("wav: corrupt and non-PCM inputs die in a require") {
    val good = WavePcm.writeWav16(pcm(4L, 100, 1), 8000, 1)
    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length - 7)
    intercept[IllegalArgumentException](WavePcm.parseWav16(truncated))
    val nonPcm = good.clone()
    nonPcm(20) = 3 // fmt code: IEEE float
    intercept[IllegalArgumentException](WavePcm.parseWav16(nonPcm))
    intercept[IllegalArgumentException](WavePcm.parseWav16(Array[Byte](1, 2, 3)))
  }

  test("resample: exact NN frame mapping, 2x upsample duplicates, WAV-at-rate passes through") {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    def rec(id: Long, bytes: Array[Byte]) =
      Multimodal.MediaRecord(id, s"t://$id", "audio", bytes, Map.empty)
    val raw = pcm(3L, 300, 2)
    val in = Seq(
      rec(0L, Multimodal.deterministicWav(3L, 8000, 300, 2)),   // 2x upsample
      rec(1L, Multimodal.deterministicWav(3L, 16000, 300, 2)),  // already at rate
      rec(2L, Multimodal.deterministicFlac(3L, 24000, 300, 2)), // 2/3 downsample + transcode
      rec(3L, Multimodal.deterministicOgg(3L, 16000, 300, 2)))  // at-rate but OGG -> transcode
    val out = Multimodal.resampleAudio(spark.createDataset(in), 16000)
      .collect().map(r => r.media_id -> r).toMap
    // 2x upsample: every source frame exactly twice, in order
    val up = WavePcm.parseWav16(out(0L).content)
    assert(up.sampleRate == 16000 && up.nFrames == 600)
    for (i <- 0 until 600; b <- 0 until 4)
      assert(up.pcmLE(i * 4 + b) == raw((i / 2) * 4 + b), s"frame $i byte $b")
    // at-rate WAV passes through byte-identically
    assert(java.util.Arrays.equals(out(1L).content, in(1).content))
    assert(out(1L).meta("orig_rate") == "16000")
    // 24 kHz FLAC -> 16 kHz WAV: floor(300*16000/24000) = 200 frames,
    // frame i sampled from source frame i*24000/16000 = i*3/2
    val down = WavePcm.parseWav16(out(2L).content)
    assert(down.sampleRate == 16000 && down.nFrames == 200)
    for (i <- 0 until 200; b <- 0 until 4)
      assert(down.pcmLE(i * 4 + b) == raw((i * 3 / 2) * 4 + b), s"frame $i byte $b")
    // at-rate OGG transcodes to WAV with identical PCM
    assert(WavePcm.isWav(out(3L).content))
    assert(java.util.Arrays.equals(WavePcm.parseWav16(out(3L).content).pcmLE, raw))
  }

  test("decoder seam: wav, flac, ogg, and (BE) aiff containers report identical features") {
    val d = new Multimodal.ImageIoDecoder
    for (seed <- Seq(5L, 6L)) {
      val (rate, frames, channels) = (16000, 1200, ((seed % 2) + 1).toInt)
      val w = d.decodeAudio(Multimodal.deterministicWav(seed, rate, frames, channels))
      val f = d.decodeAudio(Multimodal.deterministicFlac(seed, rate, frames, channels))
      val o = d.decodeAudio(Multimodal.deterministicOgg(seed, rate, frames, channels))
      assert(w == f, s"wav vs flac features differ: $w vs $f")
      assert(w == o, s"wav vs ogg features differ: $w vs $o")
      // AIFF rides the javax.sound path with native big-endian samples —
      // decodePcm16 must byte-swap, not reject
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm(seed, frames, channels)), fmt, frames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
      val a = d.decodeAudio(baos.toByteArray)
      assert(w == a, s"wav vs aiff features differ: $w vs $a")
    }
  }

  test("wav: non-canonical fmt tags are routed off the fast path, not rejected") {
    val good = WavePcm.writeWav16(pcm(8L, 100, 1), 8000, 1)
    assert(WavePcm.isCanonicalPcm16(good))
    val extensible = good.clone()
    extensible(20) = 0xfe.toByte; extensible(21) = 0xff.toByte // WAVE_FORMAT_EXTENSIBLE
    assert(!WavePcm.isCanonicalPcm16(extensible))
    // decodePcm16 must NOT die in the structural parser's format-1 require
    // (javax.sound gets its shot; this minimal mutation is not a complete
    // extensible file, so javax throwing ITS error is the accepted outcome)
    val e = intercept[Exception](Multimodal.decodePcm16(extensible))
    assert(!e.getMessage.contains("format 1"), s"fast path swallowed the dispatch: $e")
  }
}
