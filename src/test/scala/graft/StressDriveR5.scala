package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-5 scale stress: the operators added this round, measured at the
  * sizes where their scale story has to hold (run manually via
  * `sbt 'Test/runMain graftdrive.StressDriveR5'`; results recorded in
  * BASELINE.md).
  */
object StressDriveR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. Matroska demux throughput: 20k clips x 5 frames of real JPEG,
    // EBML walk + per-frame decode + hash, map-only (the AVI/MP4 twin)
    val clips = spark.range(20000L)
      .select(col("id"), col("id").as("seed"))
      .as[(Long, Long)]
      .map { case (id, seed) =>
        graft.operators.Multimodal.MediaRecord(
          id, s"fake://stress/$id.mkv", "video/x-matroska",
          graft.operators.Multimodal.deterministicMkv(seed, 16, 16, 5,
            if (id % 2 == 1) "webm" else "matroska"),
          Map.empty)
      }.localCheckpoint() // fabricate once; time the demux+decode only
    var t0 = System.nanoTime()
    val nFrames = graft.operators.Multimodal.sampleFrames(clips, everyN = 1,
        () => new graft.operators.Multimodal.ImageIoDecoder)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val t1 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE mkv-demux-20k-clips: $t1%.1f s = ${nFrames / t1 / 1e3}%.1f K frames/s ($nFrames frames)")

    // 2. Streaming ANN index maintenance at 1M vectors: bootstrap, an
    // in-distribution 500k append (steady state: one assignment pass + an
    // nlist aggregate, NO corpus rescans), then a collapsed 10k batch that
    // must refit exactly its hot bucket via the partition-pruned sample
    val root = java.nio.file.Files.createTempDirectory("stress_annidx")
    val paths = graft.streaming.StreamingAnnIndex.IndexPaths(root.resolve("index").toString)
    val cfg = graft.streaming.StreamingAnnIndex.Config(nlist = 16)
    def vecs(n: Long, idOff: Long) = spark.range(n)
      .select((col("id") + idOff).as("vec_id"),
        expr("transform(sequence(0, 63), j -> float(sin((id + " + idOff +
          ") * (j + 1) * 0.37)))").as("embedding"))
    t0 = System.nanoTime()
    graft.streaming.StreamingAnnIndex.maintainBatch(
      spark, vecs(1000000L, 0L), "vec_id", "embedding", paths, cfg, 0L)
    val tBoot = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val r1 = graft.streaming.StreamingAnnIndex.maintainBatch(
      spark, vecs(500000L, 3000000L), "vec_id", "embedding", paths, cfg, 1L)
    val tAppend = (System.nanoTime() - t0) / 1e9
    val collapsed = spark.range(10000L).select((col("id") + 9000000L).as("vec_id"),
      expr("transform(sequence(0, 63), j -> float(0.1))").as("embedding"))
    t0 = System.nanoTime()
    // shareFitMargin disabled (-1): on these quasi-random sin vectors the
    // collapsed batch fits its stolen bucket no worse than the standing
    // members, so the relative gate correctly suppresses — trigger
    // SEMANTICS are contract/spec-tested; here we force the path to
    // measure the REFIT COST at 1M corpus scale (pruned sample + swap)
    val r2 = graft.streaming.StreamingAnnIndex.maintainBatch(
      spark, collapsed, "vec_id", "embedding", paths,
      cfg.copy(shareFitMargin = -1.0), 2L)
    val tRefit = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE ann-maintain-1M: bootstrap $tBoot%.1f s, 500k append " +
      f"$tAppend%.1f s (refit: ${r1.mkString(",")}), collapsed 10k refit " +
      f"$tRefit%.1f s (buckets: ${r2.mkString(",")})")

    // 3. KMV wire at 10M rows / 1000 groups: build per-group sketches, rip
    // them apart into relational rows, re-import, and check every group's
    // estimate survives the trip exactly
    graft.functions.GraftFunctions.registerAll(spark)
    spark.range(10000000L)
      .select(concat(lit("g"), col("id") % 1000).as("g"),
        concat(lit("u"), col("id") % 300000).as("u"))
      .createOrReplaceTempView("stress_kmv_src")
    t0 = System.nanoTime()
    val mismatches = spark.sql(
      """WITH w AS (
        |  SELECT g, kmv_sketch_agg(u, 1024) AS sk FROM stress_kmv_src GROUP BY g),
        |x AS (
        |  SELECT g, kmv_estimate(sk) AS direct, kmv_export(sk) AS wire FROM w),
        |r AS (
        |  SELECT g, direct, wire.k AS k, wire.hash AS hash, h
        |  FROM x LATERAL VIEW explode(wire.hashes) AS h)
        |SELECT COUNT(*) FROM (
        |  SELECT g, ANY_VALUE(direct) AS direct,
        |    kmv_estimate(kmv_import(struct(k, hash, collect_list(h)))) AS back
        |  FROM r GROUP BY g, k, hash)
        |WHERE direct != back""".stripMargin).collect()(0).getLong(0)
    val t4 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE kmv-wire-10M-1000grp: $t4%.1f s = ${10000000 / t4 / 1e6}%.1f M rows/s ($mismatches mismatches)")

    spark.stop()
  }
}
