package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingScd2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int, Option[Int], Boolean)] =
    df.select("k", "v", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)), r.getBoolean(4))).toSet

  test("streamed folds equal batch scd2 over the applied history; late rows dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_scd2_stream_" +
      java.lang.ProcessHandle.current().pid()
    val store = s"$base/store"
    val ckpt = s"$base/ckpt"

    val stream = MemoryStream[(Long, String, Int)]
    val query = StreamingScd2.scd2Sink(
      stream.toDF().toDF("k", "v", "ver"), store, ckpt,
      Seq("k"), Seq("v"), "ver")
    try {
      // batch 1: open three keys; k3 also sees an UNCHANGED observation at
      // v5 (advances the applied high-water mark without a new interval)
      stream.addData((1L, "a", 1), (2L, "x", 1), (3L, "p", 1), (3L, "p", 5))
      query.processAllAvailable()
      // batch 2: k1 unchanged at v2 (no new interval), then changes at v3
      stream.addData((1L, "a", 2), (1L, "b", 3))
      query.processAllAvailable()
      // batch 3: k2 changes at v4; plus a LATE k1 observation at v0, a
      // replay of (1,b,3), and a MID-WINDOW late row for k3 at v3 — inside
      // (valid_from=1, max applied=5) — all three must be dropped
      stream.addData((2L, "y", 4), (1L, "z", 0), (1L, "b", 3), (3L, "q", 3))
      query.processAllAvailable()

      val streamed = rows(spark.read.parquet(store))
      // the applied history = everything except the dropped late/replayed rows
      val applied = Seq(
        (1L, "a", 1), (2L, "x", 1), (3L, "p", 1), (3L, "p", 5),
        (1L, "a", 2), (1L, "b", 3),
        (2L, "y", 4)
      ).toDF("k", "v", "ver")
      val batch = rows(graft.operators.Upsert.scd2(applied, Seq("k"), Seq("v"), "ver"))
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
      // and the intervals are the expected ones — in particular k3 stays
      // (p, from=1, current): the mid-window (q, 3) did NOT rewrite history
      assert(streamed == Set(
        (1L, "a", 1, Some(3), false), (1L, "b", 3, None, true),
        (2L, "x", 1, Some(4), false), (2L, "y", 4, None, true),
        (3L, "p", 1, None, true)))
    } finally query.stop()
  }

  test("property: any batch split of an in-order history folds to batch scd2") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { trial =>
      // random history: per-key strictly increasing versions, values from a
      // 3-letter alphabet so unchanged-value observations occur often
      val obs = (0 until 8).flatMap { k =>
        val nVer = 1 + rnd.nextInt(5)
        val vers = rnd.shuffle((1 to 12).toList).take(nVer).sorted
        vers.map(v => (k.toLong, s"v${rnd.nextInt(3)}", v))
      }
      // global version sort preserves per-key order; contiguous cuts make
      // arbitrary batch boundaries
      val ordered = rnd.shuffle(obs.toList).sortBy(_._3)
      val nCuts = 1 + rnd.nextInt(3)
      val batches = ordered.grouped(math.max(1, ordered.size / nCuts)).toSeq
      val store = s"${System.getProperty("java.io.tmpdir")}/graft_scd2_prop_" +
        s"${java.lang.ProcessHandle.current().pid()}_$trial"
      batches.foreach { b =>
        StreamingScd2.foldBatch(b.toDF("k", "v", "ver"), store,
          Seq("k"), Seq("v"), "ver")
      }
      val streamed = rows(spark.read.parquet(store))
      val batch = rows(graft.operators.Upsert.scd2(
        ordered.toDF("k", "v", "ver"), Seq("k"), Seq("v"), "ver"))
      assert(streamed == batch,
        s"trial $trial: streamed=$streamed\nbatch=$batch\nhistory=$ordered\ncuts=${batches.map(_.size)}")
    }
  }
}
