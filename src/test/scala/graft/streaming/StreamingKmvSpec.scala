package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingKmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed KMV equals batch sketch; stored sketches do cross-window set algebra") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // hour 10: users u0..u299; hour 11: users u150..u449 (overlap 150)
    val events = (0 until 3000).map { i =>
      val hour = if (i < 1500) 10 else 11
      val user = if (hour == 10) s"u${i % 300}" else s"u${150 + i % 300}"
      (new Timestamp(1700000000000L + hour * 3600000L + (i % 600) * 1000L), user)
    }
    val stream = MemoryStream[(Timestamp, String)]
    val agg = StreamingHll.windowedKmv(
      stream.toDF().toDF("ts", "u"), "ts", "u", "1 hour", "10 minutes", k = 512)
    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream_out").start()
    try {
      // incremental arrival: bottom-k union must merge across micro-batches
      events.grouped(800).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("kmv_stream_out")
        .select(col("window.start").cast("long").as("w"), col("kmv"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      val batch = events.toDF("ts", "u")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(GraftFunctions.kmv_sketch_agg(col("u"), 512).as("kmv"))
        .select(col("window.start").cast("long"), col("kmv"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(streamed.keySet == batch.keySet && streamed.size == 2)
      // bottom-k union is order-free: byte-identical state
      streamed.foreach { case (w, bytes) => assert(bytes == batch(w), s"window $w") }

      // cross-window set algebra on the STORED sketches: 300 distinct per
      // hour, 150 shared — k=512 covers both sets, so results are exact
      val Seq(w10, w11) = streamed.keySet.toSeq.sorted
      val pair = spark.table("kmv_stream_out")
        .select(col("window.start").cast("long").as("w"), col("kmv"))
      val est = pair.filter(col("w") === w10).select(col("kmv").as("a"))
        .crossJoin(pair.filter(col("w") === w11).select(col("kmv").as("b")))
        .select(
          GraftFunctions.kmv_estimate(col("a")).as("d10"),
          GraftFunctions.kmv_intersect_estimate(col("a"), col("b")).as("ix"),
          GraftFunctions.kmv_jaccard(col("a"), col("b")).as("j"))
        .collect()(0)
      assert(est.getDouble(0) == 300.0)
      assert(est.getDouble(1) == 150.0)
      assert(est.getDouble(2) == 150.0 / 450.0)
    } finally query.stop()
  }
}
