package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingQuarantineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("clean sources pass, drifted and unknown sources quarantine per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("quar").toFile
    val out = new java.io.File(tmp, "corpus").getAbsolutePath
    val quar = new java.io.File(tmp, "quarantine").getAbsolutePath
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val refPath = new java.io.File(tmp, "reference").getAbsolutePath

    // reference built from a known-good snapshot: both sources uniform 0-9
    // (i/2 decorrelates the value from the source parity)
    val good = (0 until 1000).map(i => (s"src${i % 2}", (i / 2) % 10)).toDF("src", "v")
    StreamingQuarantine.writeReference(good, "src", col("v"), refPath)

    val stream = MemoryStream[(String, Int, Long)]
    val docs = stream.toDS().toDF("src", "v", "doc_id")
    val q = StreamingQuarantine.driftGatedIngest(
      docs, "src", col("v"), refPath, tvdThreshold = 0.3, out, quar, ckpt)
    try {
      // batch 1: both sources still uniform -> everything passes
      stream.addData((0 until 200).map(i => (s"src${i % 2}", (i / 2) % 10, i.toLong)))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 200)
      assert(!new java.io.File(quar).exists())
      // batch 2: src1 collapses to a single value (TVD 0.9), src0 stays
      // clean, src9 is unknown to the reference
      stream.addData(
        (0 until 50).map(i => ("src0", i % 10, 1000L + i)) ++
        (0 until 50).map(i => ("src1", 3, 2000L + i)) ++
        (0 until 10).map(i => ("src9", i % 10, 3000L + i)))
      q.processAllAvailable()
      val corpus = spark.read.parquet(out)
      val quarantined = spark.read.parquet(quar)
      assert(corpus.count() == 250, "only src0's batch-2 slice may pass")
      assert(corpus.filter(col("doc_id") >= 2000L).count() == 0)
      val bySrc = quarantined.groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySrc == Map("src1" -> 50L, "src9" -> 10L), s"got $bySrc")
      // the quarantine carries the offending score; unknown source has none
      val tvds = quarantined.select("src", "tvd").distinct().collect()
        .map(r => r.getString(0) -> Option(r.get(1))).toMap
      assert(tvds("src1").exists(_.asInstanceOf[Double] >= 0.3))
      assert(tvds("src9").isEmpty)
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }

  test("full loop: stream quarantines a drifted source, refreshed reference readmits it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("quarloop").toFile
    val out = new java.io.File(tmp, "corpus").getAbsolutePath
    val quar = new java.io.File(tmp, "quarantine").getAbsolutePath
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val refPath = new java.io.File(tmp, "reference").getAbsolutePath
    val good = (0 until 1000).map(i => (s"src${i % 2}", (i / 2) % 10)).toDF("src", "v")
    StreamingQuarantine.writeReference(good, "src", col("v"), refPath)
    val stream = MemoryStream[(String, Int, Long)]
    val docs = stream.toDS().toDF("src", "v", "doc_id")
    val q = StreamingQuarantine.driftGatedIngest(
      docs, "src", col("v"), refPath, tvdThreshold = 0.3, out, quar, ckpt)
    try {
      // src1 has legitimately moved to a single value; the stream, scoring
      // against the stale reference, diverts it
      stream.addData(
        (0 until 50).map(i => ("src0", i % 10, i.toLong)) ++
        (0 until 50).map(i => ("src1", 3, 1000L + i)))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 50)
      assert(spark.read.parquet(quar).count() == 50)
      // operations blesses the new distribution: the refreshed good corpus
      // REPLACES src1's profile with the new single-value one (appending to
      // the stale profile would just dilute it — TVD vs the blend stays
      // high); the batch readmit then drains the quarantine...
      val good2 = good.filter($"src" =!= "src1").unionByName(
        (0 until 500).map(_ => ("src1", 3)).toDF("src", "v"))
      StreamingQuarantine.writeReference(good2, "src", col("v"), refPath)
      val summary = StreamingQuarantine.readmit(
        spark, "src", col("v"), refPath, tvdThreshold = 0.3, out, quar)
      assert(summary.collect().forall(_.getBoolean(3)), "blessed slice must readmit")
      assert(spark.read.parquet(out).count() == 100)
      assert(!new java.io.File(quar).exists())
      // ...and the STREAM now accepts the same distribution (it re-reads
      // the reference per batch — no restart needed)
      stream.addData((0 until 30).map(i => ("src1", 3, 2000L + i)))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 130)
      assert(!new java.io.File(quar).exists(), "re-ingested slice must not re-quarantine")
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }

  test("readmit drains quarantined slices once the reference blesses them") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("readmit").toFile
    val out = new java.io.File(tmp, "corpus").getAbsolutePath
    val quar = new java.io.File(tmp, "quarantine").getAbsolutePath
    val refPath = new java.io.File(tmp, "reference").getAbsolutePath
    try {
      // quarantine holds three slices, written the way driftGatedIngest
      // writes them (extra tvd column): src1 collapsed to v=3 (drifted at
      // quarantine time), src2 uniform (was unknown at quarantine time),
      // src9 collapsed AND still unknown
      val qrows =
        (0 until 50).map(i => ("src1", 3, 1000L + i, Some(0.9))) ++
        (0 until 40).map(i => ("src2", i % 10, 2000L + i, None)) ++
        (0 until 10).map(i => ("src9", 7, 3000L + i, None))
      qrows.toDF("src", "v", "doc_id", "tvd")
        .write.parquet(quar)
      // refreshed reference: src1's single-value distribution is now BLESSED
      // (the upstream change was legitimate), src2 is now known and uniform,
      // src9 still absent
      val good =
        (0 until 500).map(i => ("src1", 3)) ++
        (0 until 500).map(i => ("src2", i % 10))
      StreamingQuarantine.writeReference(good.toDF("src", "v"), "src", col("v"), refPath)

      val summary = StreamingQuarantine.readmit(
        spark, "src", col("v"), refPath, tvdThreshold = 0.3, out, quar)
      val bySrc = summary.collect()
        .map(r => r.getString(0) -> ((Option(r.get(1)), r.getLong(2), r.getBoolean(3)))).toMap
      assert(bySrc("src1")._3 && bySrc("src2")._3, s"expected src1+src2 readmitted: $bySrc")
      assert(!bySrc("src9")._3 && bySrc("src9")._1.isEmpty, "unknown source must stay put")
      assert(bySrc.values.map(_._2).sum == 100L)

      // corpus got exactly the two blessed slices, without the tvd column
      val corpus = spark.read.parquet(out)
      assert(corpus.count() == 90)
      assert(!corpus.columns.contains("tvd"))
      assert(corpus.filter(col("src") === "src9").count() == 0)
      // quarantine keeps only src9, score refreshed (still null: unknown)
      val left = spark.read.parquet(quar)
      assert(left.count() == 10)
      assert(left.select("src").distinct().collect().map(_.getString(0)).toSeq == Seq("src9"))

      // second pass: nothing newly blessed -> corpus unchanged, no dupes
      val again = StreamingQuarantine.readmit(
        spark, "src", col("v"), refPath, tvdThreshold = 0.3, out, quar)
      assert(again.collect().forall(!_.getBoolean(3)))
      assert(spark.read.parquet(out).count() == 90)

      // bless src9 too -> quarantine dir drains away entirely
      val good2 = good ++ (0 until 100).map(_ => ("src9", 7))
      StreamingQuarantine.writeReference(good2.toDF("src", "v"), "src", col("v"), refPath)
      val last = StreamingQuarantine.readmit(
        spark, "src", col("v"), refPath, tvdThreshold = 0.3, out, quar)
      assert(last.collect().forall(_.getBoolean(3)))
      assert(spark.read.parquet(out).count() == 100)
      assert(!new java.io.File(quar).exists())
      // and an empty-quarantine readmit is a clean no-op
      val noop = StreamingQuarantine.readmit(
        spark, "src", col("v"), refPath, tvdThreshold = 0.3, out, quar)
      assert(noop.isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(tmp)
    }
  }
}
