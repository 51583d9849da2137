package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingHostHealthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed health equals the batch computation per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    // two hour-windows x four hosts; statuses rotate so error rates differ
    // per host AND per window (host h gets an extra 5xx burst in hour 11)
    val events = for {
      hour <- Seq(10, 11)
      h <- 0 until 4
      i <- 0 until 50
    } yield {
      // hour 11 on host 1: half the fetches turn 500 (a real outage),
      // pushing its error permille from 300 to 600 across the windows
      val q = if (hour == 11 && h == 1 && i % 2 == 0) 8 else (i + h) % 10
      val status = q match {
        case 6 => 301; case 7 => 404; case 8 => 500; case 9 => 503
        case _ => 200
      }
      (new Timestamp(base + hour * 3600000L + i * 1000L),
        s"src$h.invalid", status)
    }
    val delays = Seq(("src0.invalid", 1L), ("src1.invalid", 2L),
      ("src2.invalid", 3L), ("src3.invalid", 5L)).toDF("host", "delay_s")

    val stream = MemoryStream[(Timestamp, String, Int)]
    val report = StreamingHostHealth.windowedHealth(
      stream.toDF().toDF("ts", "host", "status"),
      "ts", "host", "status", "1 hour", "10 minutes", delays,
      backoffPermille = 250, epochSeconds = 3600L)
    val q = report.writeStream.outputMode("complete")
      .format("memory").queryName("health_stream_out").start()
    try {
      // multi-batch arrival: counters must fold across micro-batches
      events.grouped(120).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("health_stream_out")
        .select(col("window_start").cast("long").as("w"), col("host"),
          col("n_fetches"), col("n_2xx"), col("n_3xx"), col("n_4xx"),
          col("n_5xx"), col("error_permille"), col("backoff"),
          col("effective_delay_s"), col("capacity"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      assert(streamed.size == 8) // 2 windows x 4 hosts

      // oracle: the identical batch computation per hour-aligned window
      val batch = events.toDF("ts", "host", "status")
        .withColumn("w", (col("ts").cast("long") / 3600).cast("long") * 3600)
        .groupBy(col("w"), col("host"))
        .agg(count(lit(1)).as("n_fetches"),
          sum(when(col("status").between(200, 299), 1L).otherwise(0L)).as("n_2xx"),
          sum(when(col("status").between(300, 399), 1L).otherwise(0L)).as("n_3xx"),
          sum(when(col("status").between(400, 499), 1L).otherwise(0L)).as("n_4xx"),
          sum(when(col("status") >= 500, 1L).otherwise(0L)).as("n_5xx"))
        .withColumn("error_permille", expr("(n_4xx + n_5xx) * 1000 div n_fetches"))
        .withColumn("backoff", col("error_permille") >= 250)
        .join(delays, Seq("host"))
        .withColumn("effective_delay_s",
          when(col("backoff"), col("delay_s") * 2).otherwise(col("delay_s")))
        .withColumn("capacity", expr("3600 div effective_delay_s"))
        .select(col("w"), col("host"), col("n_fetches"), col("n_2xx"),
          col("n_3xx"), col("n_4xx"), col("n_5xx"), col("error_permille"),
          col("backoff"), col("effective_delay_s"), col("capacity"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      assert(streamed == batch)

      // the burst actually moved the flagged host between the two windows
      val wins = streamed.keys.map(_._1).toSeq.distinct.sorted
      assert(wins.size == 2)
      val burst = "src1.invalid"
      val (early, late) = (streamed((wins(0), burst)), streamed((wins(1), burst)))
      assert(early(5) != late(5)) // error_permille moved with the 5xx burst
    } finally q.stop()
  }
}
