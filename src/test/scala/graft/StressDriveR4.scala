package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 scale stress: the operators added this round, measured at the
  * sizes where their scale story has to hold (run manually via
  * `sbt 'Test/runMain graftdrive.StressDriveR4'`; results recorded in
  * BASELINE.md).
  */
object StressDriveR4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. AVI container demux throughput: 20k clips x 5 frames of real JPEG,
    // demux + per-frame decode + hash, map-only
    val clips = spark.range(20000L)
      .select(col("id"), col("id").as("seed"))
      .as[(Long, Long)]
      .map { case (id, seed) =>
        graft.operators.Multimodal.MediaRecord(
          id, s"fake://stress/$id.avi", "video/avi",
          graft.operators.Multimodal.deterministicAvi(seed, 16, 16, 5),
          Map.empty)
      }.localCheckpoint() // fabricate once; time the demux+decode only
    var t0 = System.nanoTime()
    val nFrames = graft.operators.Multimodal.sampleFrames(clips, everyN = 1,
        () => new graft.operators.Multimodal.ImageIoDecoder)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val t1 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE avi-demux-20k-clips: $t1%.1f s = ${nFrames / t1 / 1e3}%.1f K frames/s ($nFrames frames)")

    // 2. Quarantine readmit at 10M rows / 1000 sources: half the sources
    // drifted (single-bin), half in-distribution; plus an unknown tail
    val refDir = java.nio.file.Files.createTempDirectory("stress_readmit")
    val refPath = refDir.resolve("reference").toString
    val quarPath = refDir.resolve("quarantine").toString
    val outPath = refDir.resolve("corpus").toString
    val good = spark.range(10000000L).select(
      concat(lit("s"), col("id") % 1000).as("source"),
      (col("id") % 16).as("bin_v"))
    graft.streaming.StreamingQuarantine.writeReference(good, "source", col("bin_v"), refPath)
    val quarantined = spark.range(10000000L).select(
      when(col("id") % 1000 < 5, lit("sX_unknown"))
        .otherwise(concat(lit("s"), col("id") % 1000)).as("source"),
      // even source number -> uniform bins (readmit), odd -> collapsed (stay)
      when((col("id") % 1000) % 2 === 0, col("id") % 16).otherwise(lit(3L)).as("bin_v"))
    quarantined.write.mode("overwrite").parquet(quarPath)
    t0 = System.nanoTime()
    val summary = graft.streaming.StreamingQuarantine.readmit(
      spark, "source", col("bin_v"), refPath, 0.3, outPath, quarPath)
    val nRe = summary.filter(col("readmitted")).count()
    val nStay = summary.filter(!col("readmitted")).count()
    val t2 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE readmit-10M-1000src: $t2%.1f s = ${10000000 / t2 / 1e6}%.1f M rows/s ($nRe sources readmitted, $nStay stay)")

    // 3. IVF refit over 1M 64-dim vectors: collapsed 10k-append drifts one
    // bucket; refit touches a bounded sample + one nlist-sized aggregate
    val vecs = spark.range(1000000L).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), j -> float(sin(vec_id * (j + 1) * 0.37)))").as("embedding"))
      .localCheckpoint()
    val cents = graft.operators.Similarity.fitCentroids(vecs, "embedding", "vec_id", nlist = 16)
    val collapsed = spark.range(10000L).select((col("id") + 2000000L).as("vec_id"),
      expr("transform(sequence(0, 63), j -> float(0.1))").as("embedding"))
    t0 = System.nanoTime()
    val (updated, _, refit) = graft.operators.Similarity.ivfRefit(
      vecs, collapsed, "embedding", "vec_id", cents, fitDropThreshold = 0.5)
    val t3 = (System.nanoTime() - t0) / 1e9
    val changed = cents.indices.count(b => updated(b).toSeq != cents(b).toSeq)
    println(f"DRIVE ivf-refit-1M-vectors: $t3%.1f s (refit buckets: ${refit.mkString(",")}; $changed centroid(s) changed)")

    spark.stop()
  }
}
