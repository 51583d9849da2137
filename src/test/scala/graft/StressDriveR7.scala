package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 scale stress: the md5 vs xxh64 rendezvous-shard throughput split
  * and the FLAC/OGG codec path (run manually via
  * `sbt 'Test/runMain graftdrive.StressDriveR7'`; results in SCALING.md).
  * The md5 HRW form exists for engine portability; the fast form is the one
  * allowed on an ingest path — this drive records the factor between them
  * at a realistic shard count, and the audio decode rate a media crawl
  * would see per node.
  */
object StressDriveR7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = 2000000L
    val keys = spark.range(n).select(
        concat(lit("doc-"), col("id"), lit("-"), md5(col("id").cast("string"))).as("k"))
      .localCheckpoint()

    def time(label: String)(body: => Unit): Double = {
      body // warm lap: codegen + JIT
      val t0 = System.nanoTime()
      body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"DRIVE $label: $t%.2f s = ${n / t / 1e6}%.2f M keys/s")
      t
    }

    val tMd5 = time("hrw-md5-2M-16shards") {
      keys.select(graft.operators.Sampling.rendezvousShard(col("k"), 16).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    val tFast = time("hrw-xxh64-2M-16shards") {
      keys.select(graft.operators.Sampling.rendezvousShardFast(col("k"), 16).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"DRIVE hrw-speedup: ${tMd5 / tFast}%.1fx (md5 $tMd5%.2f s vs xxh64 $tFast%.2f s)")

    // FLAC + OGG-FLAC decode rate: 20k clips x 8000 stereo frames (~640 MB
    // of PCM) through the full structural path (page demux, CRC-8/16, MD5)
    import spark.implicits._
    val clips = 20000
    val media = spark.range(clips).map { id =>
      (id, graft.operators.OggStream.writeOggFlac(
        graft.operators.Multimodal.deterministicPcm(id, 8000, 2), 16000, 2))
    }.toDF("id", "ogg").localCheckpoint()
    val oggBytes = media.select(sum(length(col("ogg")))).collect()(0).getLong(0)
    val decode = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      graft.operators.FlacCodec.decodeFlac(graft.operators.OggStream.extractFlac(b)).pcmLE.length
    }
    val t0 = System.nanoTime()
    media.select(decode(col("ogg")).as("n")).write.format("noop").mode("overwrite").save()
    val tDec = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE ogg-flac-decode-20k: $tDec%.2f s = ${clips / tDec}%.0f clips/s, " +
      f"${oggBytes / tDec / 1e6}%.0f MB/s container in, ${clips * 8000L * 2 * 2 / tDec / 1e6}%.0f MB/s PCM out")

    // image resize: 20k 64x48 PNGs decoded, NN-downscaled to <=16, re-encoded
    val imgs = spark.range(20000).map { id =>
      (id, graft.operators.Multimodal.deterministicPng(id, 64, 48))
    }.toDF("id", "png").localCheckpoint()
    val resize = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      val out = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 12) { var x = 0; while (x < 16) { out.setRGB(x, y, img.getRGB(x * 4, y * 4)); x += 1 }; y += 1 }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.size()
    }
    val t1 = System.nanoTime()
    imgs.select(resize(col("png")).as("n")).write.format("noop").mode("overwrite").save()
    val tRes = (System.nanoTime() - t1) / 1e9
    println(f"DRIVE png-resize-20k: $tRes%.2f s = ${20000 / tRes}%.0f images/s (decode + NN downscale + re-encode)")
    spark.stop()
  }
}
