package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("two-tier dedup: state catches in-horizon dups, history catches evicted ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val tmp = java.nio.file.Files.createTempDirectory("ingest").toFile
    val out = new java.io.File(tmp, "sink").getAbsolutePath
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath

    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDS().toDF("doc_id", "text", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))

    val q = StreamingIngest.dedupedIngest(
      docs, "eventTime", "1 second", "text", out, ckpt)
    try {
      // batch 1: A, B, and an immediate duplicate of A (state-level dedup)
      stream.addData(Seq(
        (1L, "document alpha", base),
        (2L, "document beta", base + 100),
        (3L, "document alpha", base + 200)))
      q.processAllAvailable()
      // batch 2: far-future event advances the watermark well past batch 1,
      // evicting its dedup state
      stream.addData(Seq((4L, "document gamma", base + 600000)))
      q.processAllAvailable()
      // batch 3: A re-delivered AFTER its state was evicted — the in-flight
      // tier passes it; the history anti-join must drop it. delta is new.
      stream.addData(Seq(
        (5L, "document alpha", base + 700000),
        (6L, "document delta", base + 700100)))
      q.processAllAvailable()

      val sink = spark.read.parquet(out)
      val texts = sink.select("text").collect().map(_.getString(0)).sorted.toSeq
      assert(texts == Seq("document alpha", "document beta", "document delta", "document gamma"),
        s"got $texts")
      // fingerprints are persisted for the history check
      assert(sink.columns.contains("_fp"))
      val ids = sink.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L, 6L), s"got $ids")
      // the history tier runs off the fingerprint INDEX, not sink rescans:
      // the index exists and holds exactly the sink's distinct fingerprints
      val fp = spark.read.parquet(out + "_fp")
      assert(fp.columns.toSeq == Seq("_fp"))
      val idxFps = fp.select("_fp").collect().map(_.getLong(0)).toSet
      val sinkFps = sink.select("_fp").collect().map(_.getLong(0)).toSet
      assert(idxFps == sinkFps, s"index $idxFps != sink $sinkFps")
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }

  test("sink compaction: small files collapse, content intact, dedup survives the swap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val tmp = java.nio.file.Files.createTempDirectory("ingest3").toFile
    val out = new java.io.File(tmp, "sink").getAbsolutePath
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDS().toDF("doc_id", "text", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
    // compact the sink every 3 batches into (tiny data ->) one file
    val q = StreamingIngest.dedupedIngest(
      docs, "eventTime", "1 second", "text", out, ckpt,
      compactSinkEvery = 3)
    try {
      (0 until 6).foreach { b =>
        stream.addData(Seq((b.toLong, s"unique doc $b", base + b * 600000L)))
        q.processAllAvailable()
      }
      val sinkDir = new java.io.File(out)
      val parts = sinkDir.listFiles().count(_.getName.startsWith("part-"))
      // batches 2 and 5 compacted; appends since the last compaction (none)
      // ride on top of the single compacted generation
      assert(parts == 1, s"expected 1 compacted part file, got $parts")
      assert(!new java.io.File(out + "_old").exists())
      assert(!new java.io.File(out + "_tmp").exists())
      val sink = spark.read.parquet(out)
      assert(sink.count() == 6)
      // dedup still works against the compacted generation: replay doc 0
      // after its state horizon, and add one fresh doc
      stream.addData(Seq(
        (100L, "unique doc 0", base + 10 * 600000L),
        (101L, "unique doc new", base + 10 * 600000L + 1)))
      q.processAllAvailable()
      val after = spark.read.parquet(out)
      assert(after.count() == 7, "replay must be dropped after compaction")
      assert(!after.select("doc_id").collect().map(_.getLong(0)).contains(100L))
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }

  test("fingerprint index: compaction, rebuild-from-sink, and exact re-check") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val tmp = java.nio.file.Files.createTempDirectory("ingest2").toFile
    val out = new java.io.File(tmp, "sink").getAbsolutePath
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath

    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDS().toDF("doc_id", "text", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
    // exactCheck on (collision-proof path), compact every 2 batches
    val q = StreamingIngest.dedupedIngest(
      docs, "eventTime", "1 second", "text", out, ckpt,
      exactCheck = true, compactEvery = 2)
    try {
      // four batches, far enough apart that state is evicted between them —
      // every cross-batch dup is caught by the INDEX tier
      (0 until 4).foreach { b =>
        stream.addData(Seq(
          (b * 10L, s"doc number $b", base + b * 600000L),        // fresh
          (b * 10L + 1, "recurring boilerplate", base + b * 600000L + 1))) // dup after b=0
        q.processAllAvailable()
      }
      val sink = spark.read.parquet(out)
      assert(sink.count() == 5, "4 fresh + 1 first boilerplate")
      // compaction ran (batch ids 1 and 3): the index is a single part-file
      val fpDir = new java.io.File(out + "_fp")
      val parts = fpDir.listFiles().count(_.getName.startsWith("part-"))
      assert(parts == 1, s"expected compacted single part file, got $parts")
      assert(spark.read.parquet(out + "_fp").count() == 5)
      // delete the index: next batch must rebuild it from the sink and
      // still dedup correctly (crash-mid-compaction recovery path)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(fpDir)
      stream.addData(Seq(
        (100L, "recurring boilerplate", base + 5 * 600000L), // dup vs rebuilt index
        (101L, "doc number final", base + 5 * 600000L + 1))) // fresh
      q.processAllAvailable()
      val after = spark.read.parquet(out)
      assert(after.count() == 6, "rebuilt index must still drop the replay")
      assert(!after.select("doc_id").collect().map(_.getLong(0)).contains(100L))
      assert(spark.read.parquet(out + "_fp").count() == 6)
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }
}
