package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** resizeImages: exact integer geometry, genuine PNG output, byte-stable
  * determinism, pass-through below the bound, and pixel-level
  * nearest-neighbor correctness.
  */
class MultimodalResizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(maxDim: Int): Map[Long, Multimodal.MediaRecord] = {
    import spark.implicits._
    val media = (0L until 40L).map { id =>
      Multimodal.MediaRecord(id, s"t://$id.png", "image/png",
        Multimodal.deterministicPng(id, ((id % 16) + 1).toInt * 4, ((id % 12) + 1).toInt * 4),
        Map.empty)
    }
    Multimodal.resizeImages(spark.createDataset(media), maxDim)
      .collect().map(r => r.media_id -> r).toMap
  }

  test("downscale hits the exact integer geometry and stays a real PNG") {
    val out = corpus(16)
    for ((id, r) <- out) {
      val w = ((id % 16) + 1).toInt * 4
      val h = ((id % 12) + 1).toInt * 4
      val m = math.max(w, h)
      val (ew, eh) = if (m <= 16) (w, h) else (math.max(1, w * 16 / m), math.max(1, h * 16 / m))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      assert(img != null, s"media $id: resized bytes are not a decodable image")
      assert((img.getWidth, img.getHeight) == ((ew, eh)), s"media $id geometry")
      assert(r.meta("orig_width").toInt == w && r.meta("orig_height").toInt == h)
    }
  }

  test("within-bound images pass through byte-identically; output is deterministic") {
    val a = corpus(16)
    val small = a.keys.filter { id =>
      math.max(((id % 16) + 1) * 4, ((id % 12) + 1) * 4) <= 16
    }
    assert(small.nonEmpty)
    small.foreach { id =>
      val orig = Multimodal.deterministicPng(id, ((id % 16) + 1).toInt * 4, ((id % 12) + 1).toInt * 4)
      assert(java.util.Arrays.equals(a(id).content, orig), s"media $id re-encoded needlessly")
    }
    val b = corpus(16)
    a.keys.foreach(id => assert(java.util.Arrays.equals(a(id).content, b(id).content),
      s"media $id resize not byte-deterministic"))
  }

  test("alpha sources keep alpha when resized (channel contract independent of bound)") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(40, 40, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 40; x <- 0 until 40) img.setRGB(x, y, ((x * 6) << 24) | (x << 16) | y)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rec = Multimodal.MediaRecord(0L, "t://a.png", "image/png", baos.toByteArray, Map.empty)
    val out = Multimodal.resizeImages(spark.createDataset(Seq(rec)), 16).collect()(0)
    val resized = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert(resized.getWidth == 16 && resized.getHeight == 16)
    assert(resized.getColorModel.hasAlpha, "resize dropped the alpha channel")
  }

  test("decompression-bomb guard: declared-huge images divert BEFORE pixel decode") {
    import spark.implicits._
    // a real small PNG with its IHDR patched to declare 60000x60000 (CRC
    // fixed up): a few KB of input, a ~14 GB pixel buffer if decoded
    val bomb = Multimodal.gridPng(1L).clone()
    def putBe(off: Int, v: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    putBe(16, 60000); putBe(20, 60000) // IHDR width/height
    val crc = new java.util.zip.CRC32
    crc.update(bomb, 12, 4 + 13) // chunk type + data
    putBe(29, crc.getValue.toInt)
    assert(Multimodal.probeImageDims(bomb).contains((60000, 60000)))
    val recs = Seq(
      Multimodal.MediaRecord(0L, "t://bomb.png", "image/png", bomb, Map.empty),
      Multimodal.MediaRecord(1L, "t://ok.png", "image/png", Multimodal.gridPng(2L), Map.empty))
    val t0 = System.nanoTime()
    val out = Multimodal.resizeImagesSafe(spark.createDataset(recs), 16)
      .collect().map(o => o.media_id -> o).toMap
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(out(0L).error == "media_too_large", s"got ${out(0L).error}")
    assert(out(0L).meta("error_class") == "MediaTooLargeException")
    assert(java.util.Arrays.equals(out(0L).content, bomb), "bomb bytes must pass through")
    assert(out(1L).error == null)
    // the guard must fire from the HEADER — seconds, not an OOM or a
    // minutes-long decode attempt
    assert(elapsed < 30.0, s"guard too slow: $elapsed s — did it decode pixels?")
    // strict stage fails the job with the dedicated type in the cause chain
    // (Spark wraps executor-side throws in SparkException)
    val e = intercept[Exception] {
      Multimodal.resizeImages(spark.createDataset(Seq(recs.head)), 16).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(_.isInstanceOf[Multimodal.MediaTooLargeException]) ||
      chain.exists(t => t.getMessage != null && t.getMessage.contains("decompression-bomb")),
      s"wrong failure: $e")
  }

  test("nearest-neighbor samples exactly src(x*w/nw, y*h/nh)") {
    val id = 7L
    val w = ((id % 16) + 1).toInt * 4
    val h = ((id % 12) + 1).toInt * 4
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.deterministicPng(id, w, h)))
    val r = corpus(16)(id)
    val dst = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
    val (nw, nh) = (dst.getWidth, dst.getHeight)
    for (y <- 0 until nh; x <- 0 until nw)
      assert((dst.getRGB(x, y) & 0xffffff) == (src.getRGB(x * w / nw, y * h / nh) & 0xffffff),
        s"pixel ($x,$y)")
  }
}
