package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stateful sessionization emits sessions after watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val gap = 60000L // 1 min

    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDS()
      .toDF("key", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))

    val sessions = StreamingSessionize.sessionize(events, "key", "eventTime", gap)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // key 1: two bursts separated by > gap; key 2: one burst
      stream.addData(Seq((1L, base), (1L, base + 10000), (2L, base + 5000)))
      q.processAllAvailable()
      // second burst for key 1, far beyond the gap -> closes burst 1 once
      // the watermark (max event time) passes burst1.end + gap
      stream.addData(Seq((1L, base + 300000), (2L, base + 600000)))
      q.processAllAvailable()
      stream.addData(Seq((1L, base + 900000))) // advance watermark further
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .select("key", "start", "end", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // burst 1 of key 1: [base, base+10000], 2 events
      assert(got.contains((1L, base, base + 10000, 2L)), s"got $got")
      // key 2 burst 1: single event at base+5000
      assert(got.contains((2L, base + 5000, base + 5000, 1L)), s"got $got")
      // key 1 burst 2 closed by the third batch's watermark
      assert(got.contains((1L, base + 300000, base + 300000, 1L)), s"got $got")
    } finally q.stop()
  }
}
