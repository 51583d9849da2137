package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sketch warehouse: per-key HLL + CMS + MG sketches folded
  * batch-by-batch must be BYTE-IDENTICAL to a single-pass build over the
  * concatenated data (the family's merge algebra is order/batching
  * independent: register max-fold, counter addition, exact-regime MG);
  * replayed batch ids must be skipped.
  */
class StreamingSketchRollupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed sketch folds == single-pass sketches, byte-identical; replays skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_sketch_rollup_" +
      java.lang.ProcessHandle.current().pid()
    val store = s"$base/store"
    val ckpt = s"$base/ckpt"

    val buildAggs = Seq(
      GraftFunctions.hll_sketch_agg(col("user"), 1 << 12).as("users_hll"),
      GraftFunctions.cms_sketch_agg(col("item"), 5, 512).as("items_cms"),
      GraftFunctions.topk_sketch_agg(col("item"), 64).as("items_mg"))
    val unionAggs = Seq(
      GraftFunctions.hll_union_agg(col("users_hll")).as("users_hll"),
      GraftFunctions.cms_union_agg(col("items_cms")).as("items_cms"),
      GraftFunctions.topk_union_agg(col("items_mg")).as("items_mg"))

    val stream = MemoryStream[(String, Long, String)]
    val q = StreamingSketchRollup.sketchSink(
      stream.toDF().toDF("day", "user", "item"), store, ckpt,
      Seq("day"), buildAggs, unionAggs)
    val all = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    try {
      val batches = Seq(
        (0 until 300).map(i => ("d1", (i % 40).toLong, s"it${i % 7}")),
        (0 until 200).map(i => ("d1", (i % 90).toLong, s"it${i % 11}")) ++
          (0 until 100).map(i => ("d2", i.toLong, s"it${i % 5}")),
        (0 until 150).map(i => ("d2", (i % 30).toLong, s"it${i % 9}")))
      batches.foreach { b => all ++= b; stream.addData(b: _*); q.processAllAvailable() }

      val stored = spark.read.parquet(store)
        .select("day", "users_hll", "items_cms", "items_mg")
        .collect().map(r => r.getString(0) ->
          (r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2), r.getAs[Array[Byte]](3))).toMap
      val direct = all.toSeq.toDF("day", "user", "item")
        .groupBy("day").agg(buildAggs.head, buildAggs.tail: _*)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2), r.getAs[Array[Byte]](3))).toMap
      assert(stored.keySet == Set("d1", "d2"))
      for (day <- stored.keySet) {
        assert(java.util.Arrays.equals(stored(day)._1, direct(day)._1), s"$day hll")
        assert(java.util.Arrays.equals(stored(day)._2, direct(day)._2), s"$day cms")
        // MG byte wire is map-order dependent; compare the canonical export
        val Seq(se, de) = Seq(stored(day)._3, direct(day)._3).map { bytes =>
          spark.range(1).select(GraftFunctions.topk_export(lit(bytes)))
            .collect().head.getStruct(0).toString
        }
        assert(se == de, s"$day mg")
      }

      // replayed batch id: fold again with an OLD id — store must not change
      val before = spark.read.parquet(store).agg(max("_applied_batch")).head.getLong(0)
      StreamingSketchRollup.foldBatch(
        Seq(("d1", 999L, "itX")).toDF("day", "user", "item"),
        batchId = 0L, store, Seq("day"), buildAggs, unionAggs)
      val after = spark.read.parquet(store)
      assert(after.agg(max("_applied_batch")).head.getLong(0) == before)
      val d1 = after.filter(col("day") === "d1").select("users_hll")
        .head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(d1, stored("d1")._1), "replay mutated the store")
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("null grouping keys fold into ONE store row, not one per batch") {
    import spark.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_sketch_nullkey_" +
      java.lang.ProcessHandle.current().pid()
    val store = s"$base/store"
    try {
      val buildAggs = Seq(
        GraftFunctions.hll_sketch_agg(col("user"), 1 << 12).as("users_hll"))
      val unionAggs = Seq(
        GraftFunctions.hll_union_agg(col("users_hll")).as("users_hll"))
      def fold(id: Long, rows: Seq[(Option[String], Long)]): Unit =
        StreamingSketchRollup.foldBatch(
          rows.toDF("day", "user"), id, store, Seq("day"), buildAggs, unionAggs)
      fold(0L, Seq((None, 1L), (Some("d1"), 2L)))
      fold(1L, Seq((None, 3L), (None, 4L)))
      fold(2L, Seq((Some("d1"), 5L)))
      val rows = spark.read.parquet(store)
      assert(rows.count() == 2, "null key duplicated across batches")
      val nullEst = rows.filter(col("day").isNull)
        .select(GraftFunctions.hll_estimate(col("users_hll")))
        .head.getDouble(0)
      assert(math.round(nullEst) == 3L) // users 1, 3, 4 all folded into it
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(base))
    }
  }
}
