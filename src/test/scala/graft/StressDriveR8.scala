package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 scale stress (run manually via
  * `sbt 'Test/runMain graftdrive.StressDriveR8'`; results in BASELINE.md /
  * SCALING.md):
  *  - hrw_shard throughput now that the expression codegens (r7 measured
  *    25.8 M keys/s through the CodegenFallback interpreter);
  *  - megapixel image resize through the bulk row-buffer path (r7's
  *    per-pixel getRGB/setRGB was the flagged hotspot) — the REAL
  *    Multimodal.resizeImages operator, not a toy loop;
  *  - FIXED+Rice FLAC encode and decode rates + compression factor (the
  *    r8 wild-FLAC surface), against the verbatim path.
  */
object StressDriveR8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 20000000L // 20M: at 2M the lap is fixed job overhead, not hashing
    val keys = spark.range(n).select(
        concat(lit("doc-"), col("id"), lit("-"), md5(col("id").cast("string"))).as("k"))
      .localCheckpoint()

    def time(label: String, unit: Long)(body: => Unit): Double = {
      body // warm lap: codegen + JIT
      val t0 = System.nanoTime()
      body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"DRIVE $label: $t%.2f s = ${unit / t / 1e6}%.2f M/s")
      t
    }

    time("hrw-xxh64-codegen-20M-16shards", n) {
      keys.select(graft.operators.Sampling.rendezvousShardFast(col("k"), 16).as("s"))
        .write.format("noop").mode("overwrite").save()
    }

    // megapixel resize: 512 x 1280x960 PNGs (1.23 MP) through the real
    // operator — ImageIO decode, bulk row-buffer NN downscale to <=256,
    // PNG re-encode. The corpus is built once and checkpointed so only
    // the resize lap is timed.
    val mp = 512
    val mpx = 1280L * 960L
    val media = spark.range(mp).map { id =>
      graft.operators.Multimodal.MediaRecord(
        id, s"stress://$id.png", "image/png",
        graft.operators.Multimodal.deterministicPng(id, 1280, 960), Map.empty)
    }.repartition(64).localCheckpoint()
    val t1 = System.nanoTime()
    graft.operators.Multimodal.resizeImages(media, maxDim = 256)
      .map(_.content.length).write.format("noop").mode("overwrite").save()
    val tRes = (System.nanoTime() - t1) / 1e9
    println(f"DRIVE megapixel-resize-512: $tRes%.2f s = ${mp / tRes}%.1f images/s, " +
      f"${mp * mpx / tRes / 1e6}%.0f Mpx/s (decode + bulk-NN + re-encode)")

    // FIXED-FLAC encode + decode: 10k clips x 8000 stereo frames (~320 MB
    // PCM). Encode rate, decode rate (full CRC/MD5 walk incl. prediction
    // reconstruction + decorrelation), and the compression factor.
    val clips = 10000
    val pcmBytes = clips.toLong * 8000 * 2 * 2
    val pcmDf = spark.range(clips).map { id =>
      (id, graft.operators.Multimodal.deterministicPcm(id, 8000, 2))
    }.toDF("id", "pcm").localCheckpoint()
    val enc = udf { (b: Array[Byte]) =>
      graft.operators.FlacCodec.writeFlacFixed(b, 16000, 2).length
    }
    val tEnc = time("flac-fixed-encode-10k", pcmBytes) {
      pcmDf.select(enc(col("pcm")).as("n")).write.format("noop").mode("overwrite").save()
    }
    val flacDf = spark.range(clips).map { id =>
      (id, graft.operators.FlacCodec.writeFlacFixed(
        graft.operators.Multimodal.deterministicPcm(id, 8000, 2), 16000, 2))
    }.toDF("id", "flac").localCheckpoint()
    val flacBytes = flacDf.select(sum(length(col("flac")))).collect()(0).getLong(0)
    val dec = udf { (b: Array[Byte]) =>
      graft.operators.FlacCodec.decodeFlac(b).pcmLE.length
    }
    val tDec = time("flac-fixed-decode-10k", pcmBytes) {
      flacDf.select(dec(col("flac")).as("n")).write.format("noop").mode("overwrite").save()
    }
    println(f"DRIVE flac-fixed: compression ${pcmBytes.toDouble / flacBytes}%.1fx " +
      f"(${flacBytes / 1e6}%.0f MB for ${pcmBytes / 1e6}%.0f MB PCM), " +
      f"encode ${pcmBytes / tEnc / 1e6}%.0f MB/s, decode ${pcmBytes / tDec / 1e6}%.0f MB/s")
    spark.stop()
  }
}
