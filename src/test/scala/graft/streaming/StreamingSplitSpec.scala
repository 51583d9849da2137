package graft.streaming

import graft.operators.Sampling
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ingest-time splits follow the cluster map, including mid-stream map updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ssplit").toFile
    val out = new java.io.File(tmp, "lake").getAbsolutePath
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val mapPath = new java.io.File(tmp, "clusters").getAbsolutePath
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

    val stream = MemoryStream[Long]
    val docs = stream.toDS().toDF("doc_id")
    val q = StreamingSplit.splitAssignedIngest(docs, "doc_id", mapPath, fr, out, ckpt)
    try {
      // batch 1: no cluster map yet — everyone is their own representative
      stream.addData(0L until 50L: _*)
      q.processAllAvailable()
      // the batch dedup job now publishes a cluster map: docs 100-109 are
      // near-copies of doc 7 (cluster label = min id = 7)
      (100L until 110L).map(i => (i, 7L)).toDF("id", "cluster")
        .write.mode("overwrite").parquet(mapPath)
      // batch 2: the copies arrive AFTER the map update
      stream.addData(100L until 110L: _*)
      q.processAllAvailable()

      val lake = spark.read.parquet(out)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
      assert(lake.size == 60)
      val expect7 = lake(7L)
      // batch-1 docs (no map yet) carry the plain portable split of their id
      val ownSplits = spark.range(50).select(col("id"),
          Sampling.portableSplit(col("id"), fr).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      (0L until 50L).foreach(id => assert(lake(id) == ownSplits(id)))
      // every late near-copy of doc 7 landed in doc 7's split — no leakage
      (100L until 110L).foreach { id =>
        assert(lake(id) == expect7, s"doc $id split ${lake(id)} != ${expect7}")
      }
      // and the label matches what the batch operator assigns for cluster 7
      val batchLabel = spark.range(1).select(
        Sampling.portableSplit(lit(7L), fr).as("s")).collect().head.getString(0)
      assert(expect7 == batchLabel)
      // split-partitioned layout on disk
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("split=")).toSet
      assert(dirs.subsetOf(Set("split=train", "split=val", "split=test")) && dirs.nonEmpty)
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
