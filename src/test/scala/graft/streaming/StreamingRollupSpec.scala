package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingRollupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.select("k", "v", "n_rows")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("streamed folds equal the batch rollup; replayed batch ids are skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_rollup_stream_" +
      java.lang.ProcessHandle.current().pid()
    val store = s"$base/store"
    val ckpt = s"$base/ckpt"

    val stream = MemoryStream[(String, Long)]
    val query = StreamingRollup.rollupSink(
      stream.toDF().toDF("k", "v"), store, ckpt, Seq("k"), Seq("v"))
    val all = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    try {
      // three batches: overlapping keys, a key that only ever arrives late
      val batches = Seq(
        Seq(("a", 1L), ("a", 2L), ("b", 10L)),
        Seq(("b", 5L), ("c", 100L)),
        Seq(("a", 3L), ("d", 7L), ("d", 8L)))
      batches.foreach { b =>
        all ++= b
        stream.addData(b: _*)
        query.processAllAvailable()
        val batchRollup = rows(graft.operators.Upsert.rollup(
          all.toSeq.toDF("k", "v"), Seq("k"), Seq("v")))
        val streamed = rows(spark.read.parquet(store))
        assert(streamed == batchRollup, s"after batch: $streamed vs $batchRollup")
      }

      // replay guard: re-folding an already-applied batch id changes nothing
      val before = rows(spark.read.parquet(store))
      StreamingRollup.foldBatch(
        Seq(("a", 999L)).toDF("k", "v"), 0L, store, Seq("k"), Seq("v"))
      assert(rows(spark.read.parquet(store)) == before,
        "replayed batch id must be skipped")
      // a NEW batch id still folds
      StreamingRollup.foldBatch(
        Seq(("a", 100L)).toDF("k", "v"), 99L, store, Seq("k"), Seq("v"))
      val after = rows(spark.read.parquet(store))
      assert(after("a") == (before("a")._1 + 100L, before("a")._2 + 1))
    } finally {
      query.stop()
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }

  test("crash between swap renames recovers on the next fold") {
    import spark.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_rollup_crash_" +
      java.lang.ProcessHandle.current().pid()
    val store = s"$base/store"
    StreamingRollup.foldBatch(Seq(("x", 1L)).toDF("k", "v"), 0L, store, Seq("k"), Seq("v"))
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // simulate dying between swap-aside and swap-in: store renamed away
      fs.rename(new org.apache.hadoop.fs.Path(store),
        new org.apache.hadoop.fs.Path(store + "_old"))
      StreamingRollup.foldBatch(Seq(("x", 2L)).toDF("k", "v"), 1L, store, Seq("k"), Seq("v"))
      val got = spark.read.parquet(store).select("k", "v", "n_rows")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(("x", 3L, 2L)), s"recovered store wrong: $got")
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }
}
