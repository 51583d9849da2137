package graft.streaming

import graft.operators.Quality
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val checks = Seq(
    Quality.NotNull("lang"),
    Quality.InRange("score", 0.0, 1.0),
    Quality.OneOf("lang", Seq("en", "fr", "de")),
    Quality.Matches("doc_id", "^doc-\\d+$"),
    Quality.MinRows(450))

  test("windowed gate equals the batch gate per window; violations localized") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    // hour 10: clean except row floor; hour 11: seeded nulls, out-of-range
    // scores, an unknown lang and malformed ids
    val events = (0 until 900).map { i =>
      val hour = if (i < 500) 10 else 11
      val bad = hour == 11 && i % 50 == 0 // 8 bad rows in hour 11
      (new Timestamp(base + hour * 3600000L + (i % 600) * 1000L),
        if (bad && i % 100 == 0) null else if (bad) "xx" else Seq("en", "fr", "de")(i % 3),
        if (bad) 1.5 else (i % 100) / 100.0,
        if (bad) s"DOC_$i" else s"doc-$i")
    }
    val stream = MemoryStream[(Timestamp, String, Double, String)]
    val report = StreamingQuality.windowedCheck(
      stream.toDF().toDF("ts", "lang", "score", "doc_id"),
      "ts", "1 hour", "10 minutes", checks)
    val q = report.writeStream.outputMode("complete")
      .format("memory").queryName("quality_stream_out").start()
    try {
      // multi-batch arrival: counters must fold across micro-batches
      events.grouped(250).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("quality_stream_out")
        .select(col("window_start").cast("long").as("w"), col("check"),
          col("target"), col("violations"), col("passed"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
          (r.getLong(3), r.getBoolean(4))).toMap

      // oracle: the batch gate over each window's slice, windows derived
      // with the SAME window() semantics (epoch-aligned) as the stream
      val df = events.toDF("ts", "lang", "score", "doc_id")
        .withColumn("_w", window(col("ts"), "1 hour"))
      val windows = df.select(col("_w.start").cast("long"))
        .distinct().collect().map(_.getLong(0)).sorted
      assert(windows.length == 2)
      val expected = windows.flatMap { w =>
        val slice = df.filter(col("_w.start").cast("long") === w).drop("_w")
        Quality.check(slice, checks).collect().map(r =>
          (w, r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getBoolean(3)))
      }.toMap
      assert(streamed == expected)
      // sanity on the scenario itself: the early window (500 rows) passes
      // everything; the late one (400 rows) fails every rule incl. the floor
      assert(streamed((windows(0), "not_null", "lang"))._2)
      assert(streamed((windows(0), "min_rows[450]", "*"))._2)
      assert(!streamed((windows(1), "min_rows[450]", "*"))._2)
      assert(!streamed((windows(1), "in_range[0.0,1.0]", "score"))._2)
      assert(!streamed((windows(1), "not_null", "lang"))._2)
    } finally q.stop()
  }

  test("windowed histogram + drift equals the batch drift monitor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    // srcA keeps its value distribution across hours; srcB shifts hard
    val events = (0 until 800).map { i =>
      val hour = if (i < 400) 10 else 11
      val src = if (i % 2 == 0) "srcA" else "srcB"
      val v =
        if (src == "srcA") i % 10
        else if (hour == 10) i % 5 else 5 + i % 5 // disjoint bins across hours
      (new Timestamp(base + hour * 3600000L + (i % 600) * 1000L), src, v)
    }
    val stream = MemoryStream[(Timestamp, String, Int)]
    val hist = StreamingQuality.windowedHistogram(
      stream.toDF().toDF("ts", "src", "v"), "ts", "1 hour", "10 minutes",
      "src", col("v"))
    val q = hist.writeStream.outputMode("complete")
      .format("memory").queryName("hist_stream_out").start()
    try {
      events.grouped(300).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val drift = StreamingQuality.histogramDrift(
          spark.table("hist_stream_out"), "src")
        .collect().map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(drift.size == 2) // one (window2 vs window1) row per source
      // oracle: the batch drift monitor over the same two hour-slices
      val df = events.toDF("ts", "src", "v")
        .withColumn("_w", window(col("ts"), "1 hour"))
      val w0 = df.select(col("_w.start").cast("long")).distinct()
        .collect().map(_.getLong(0)).min
      val expected = graft.operators.Quality.distributionDrift(
          df, "src", col("_w.start").cast("long") === w0, col("v"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(drift == expected)
      // the shifted source alarms at exactly 1.0 (disjoint bins), the
      // stable one stays at 0
      assert(drift("srcB")._3 == 1.0 && drift("srcA")._3 == 0.0)
    } finally q.stop()
  }

  test("Unique is rejected on streams") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Timestamp, String)]
    val ex = intercept[IllegalArgumentException] {
      StreamingQuality.windowedCheck(stream.toDF().toDF("ts", "k"),
        "ts", "1 hour", "10 minutes", Seq(Quality.Unique(Seq("k"))))
    }
    assert(ex.getMessage.contains("Unique"))
  }
}
