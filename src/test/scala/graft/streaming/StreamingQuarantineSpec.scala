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
}
