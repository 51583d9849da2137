package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = 1700000000000L

  test("stream-stream interval join matches the batch join on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val imps = MemoryStream[(Long, Long)]
    val clks = MemoryStream[(Long, Long)]
    val impDf = imps.toDS().toDF("imp_ad", "imp_ms")
      .withColumn("imp_ts", timestamp_millis(col("imp_ms")))
    val clkDf = clks.toDS().toDF("clk_ad", "clk_ms")
      .withColumn("clk_ts", timestamp_millis(col("clk_ms")))

    val joined = StreamingJoin.intervalJoin(
      impDf, "imp_ad", "imp_ts", clkDf, "clk_ad", "clk_ts",
      before = "0 seconds", after = "1 minute")
      .select(col("imp_ad"), col("imp_ms"), col("clk_ms"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      // ad 1: click 30 s after imp (match); ad 2: click 2 min after (no
      // match); ad 3: click 10 s BEFORE imp (no match — window is one-sided)
      imps.addData(Seq((1L, base), (2L, base), (3L, base)))
      clks.addData(Seq((1L, base + 30000), (2L, base + 120000), (3L, base - 10000)))
      q.processAllAvailable()
      // same ad clicked twice inside the window -> two joined rows
      imps.addData(Seq((4L, base + 300000)))
      clks.addData(Seq((4L, base + 310000), (4L, base + 350000)))
      q.processAllAvailable()

      val got = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = Set(
        (1L, base, base + 30000),
        (4L, base + 300000, base + 310000),
        (4L, base + 300000, base + 350000))
      assert(got == expect, s"got $got")

      // state eviction: push both watermarks far past ad 1's window, then
      // replay a click that WOULD have matched it — the buffered left row
      // is gone and the late click is dropped, so no new output appears
      imps.addData(Seq((8L, base + 3600000)))
      clks.addData(Seq((8L, base + 3600000)))
      q.processAllAvailable()
      clks.addData(Seq((1L, base + 40000))) // in-window time, far behind watermark
      q.processAllAvailable()
      val after = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(after == expect + ((8L, base + 3600000, base + 3600000)),
        s"late click leaked through evicted state: $after")

      // batch equivalence: the same rows through the static join path
      val impB = Seq((1L, base), (2L, base), (3L, base), (4L, base + 300000))
        .toDF("imp_ad", "imp_ms").withColumn("imp_ts", timestamp_millis(col("imp_ms")))
      val clkB = Seq((1L, base + 30000), (2L, base + 120000), (3L, base - 10000),
        (4L, base + 310000), (4L, base + 350000))
        .toDF("clk_ad", "clk_ms").withColumn("clk_ts", timestamp_millis(col("clk_ms")))
      val batch = impB.join(clkB,
        col("imp_ad") === col("clk_ad") &&
          col("clk_ts") >= col("imp_ts") &&
          col("clk_ts") <= col("imp_ts") + expr("INTERVAL 1 minute"))
        .select(col("imp_ad"), col("imp_ms"), col("clk_ms"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("left-outer interval join emits null-padded rows after the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val imps = MemoryStream[(Long, Long)]
    val clks = MemoryStream[(Long, Long)]
    val impDf = imps.toDS().toDF("imp_ad", "imp_ms")
      .withColumn("imp_ts", timestamp_millis(col("imp_ms")))
    val clkDf = clks.toDS().toDF("clk_ad", "clk_ms")
      .withColumn("clk_ts", timestamp_millis(col("clk_ms")))

    val joined = StreamingJoin.intervalJoin(
      impDf, "imp_ad", "imp_ts", clkDf, "clk_ad", "clk_ts",
      before = "0 seconds", after = "1 minute", joinType = "left_outer")
      .select(col("imp_ad"), col("clk_ms"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    try {
      imps.addData(Seq((1L, base), (2L, base)))
      clks.addData(Seq((1L, base + 30000)))
      q.processAllAvailable()
      // push both watermarks far past base + 1 min so ad 2 is provably
      // unmatched and must be emitted with a null click
      imps.addData(Seq((9L, base + 600000)))
      clks.addData(Seq((9L, base + 600000)))
      q.processAllAvailable()
      imps.addData(Seq((10L, base + 1200000)))
      clks.addData(Seq((10L, base + 1200000)))
      q.processAllAvailable()

      val rows = spark.table("ssj_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      assert(rows.contains((1L, Some(base + 30000))))
      assert(rows.contains((2L, None)), s"unmatched imp not emitted: ${rows.toSeq}")
    } finally q.stop()
  }
}
