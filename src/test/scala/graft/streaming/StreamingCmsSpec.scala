package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingCmsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed CMS equals batch sketch; stored sketches answer point queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 2000).map { i =>
      val hour = if (i % 2 == 0) 10 else 11
      (new Timestamp(1700000000000L + hour * 3600000L + (i % 600) * 1000L),
        s"key${i % 5}")
    }
    val stream = MemoryStream[(Timestamp, String)]
    val agg = StreamingHll.windowedFrequency(
      stream.toDF().toDF("ts", "k"), "ts", "k", "1 hour", "10 minutes",
      depth = 5, width = 512)
    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream_out").start()
    try {
      // incremental arrival: the sketch must merge across micro-batches
      events.grouped(700).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("cms_stream_out")
        .select(col("window.start").cast("long").as("w"), col("cms"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      val batch = events.toDF("ts", "k")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(GraftFunctions.cms_sketch_agg(col("k"), 5, 512).as("cms"))
        .select(col("window.start").cast("long"), col("cms"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(streamed.keySet == batch.keySet && streamed.size == 2)
      // counter addition is exact and order-free: byte-identical state
      streamed.foreach { case (w, bytes) => assert(bytes == batch(w), s"window $w") }

      // the stored per-window sketches answer exact-regime point lookups
      val perWindow = spark.table("cms_stream_out")
        .select(col("window.start").cast("long").as("w"),
          GraftFunctions.cms_query(col("cms"), lit("key0")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = events.toDF("ts", "k").filter(col("k") === "key0")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long"), col("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perWindow == exact)
    } finally query.stop()
  }

  test("streaming windowed GK quantiles hit the rank-error bound per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two hourly windows of pseudo-uniform latencies in [0, 1000)
    val events = (0 until 4000).map { i =>
      val hour = if (i % 2 == 0) 10 else 11
      (new Timestamp(1700000000000L + hour * 3600000L + (i % 600) * 1000L),
        ((i * 2654435761L) % 100000) / 100.0)
    }
    val stream = MemoryStream[(Timestamp, Double)]
    val agg = StreamingHll.windowedQuantile(
      stream.toDF().toDF("ts", "v"), "ts", "v", "1 hour", "10 minutes",
      relativeError = 0.01)
    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName("gk_stream_out").start()
    try {
      events.grouped(1500).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val p50s = spark.table("gk_stream_out")
        .select(col("window.start").cast("long").as("w"),
          GraftFunctions.gk_quantile(col("gk"), lit(0.5)).as("p50"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(p50s.size == 2)
      // uniform [0, 1000): the median must land near 500 (1% rank error
      // over ~2000 values per window, plus sampling discreteness)
      p50s.foreach { case (w, p) =>
        assert(math.abs(p - 500.0) < 30.0, s"window $w p50=$p")
      }
    } finally query.stop()
  }
}
