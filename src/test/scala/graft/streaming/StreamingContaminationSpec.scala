package graft.streaming

import graft.operators.Contamination
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingContaminationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming alerts equal the batch audit per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = (0 until 5).map { i =>
      (i.toLong, (0 until 40).map(w => s"bench$i word$w token${(w * 13 + i) % 29}").mkString(" "))
    }
    val evalDf = evalDocs.toDF("eval_id", "text")
    val base = 1700000000000L
    // two 1-hour windows; every 5th doc embeds a long span of an eval doc
    val events = (0 until 60).map { i =>
      val hour = if (i < 30) 10 else 11
      val clean = (0 until 50).map(w => s"doc$i tok${(i * 17 + w * 3) % 101}").mkString(" ")
      val text =
        if (i % 5 == 0) {
          val e = evalDocs(i % 5 + i % evalDocs.size)._2
          clean + " " + e.substring(0, e.length / 2)
        } else clean
      (new Timestamp(base + hour * 3600000L + (i % 600) * 1000L), i.toLong, text)
    }
    val stream = MemoryStream[(Timestamp, Long, String)]
    val alerts = StreamingContamination.monitor(
      stream.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
      evalDf, "eval_id", "text",
      "1 hour", "10 minutes", threshold = 0.1, maxPostings = 1000000)
    val q = alerts.writeStream.outputMode("complete")
      .format("memory").queryName("contam_stream_out").start()
    try {
      events.grouped(20).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("contam_stream_out")
        .select(col("window_start").cast("long").as("w"), col("a_id"),
          col("b_id"), col("shared"), col("a_total"), col("overlap"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          (r.getLong(3), r.getInt(4).toLong, r.getDouble(5))).toMap
      assert(streamed.nonEmpty, "scenario produced no contamination alerts")

      // batch oracle: the audited overlap per window slice (caps disabled on
      // both sides -> semantics identical)
      val df = events.toDF("ts", "doc_id", "text")
        .withColumn("_w", window(col("ts"), "1 hour"))
      val windows = df.select(col("_w.start").cast("long"))
        .distinct().collect().map(_.getLong(0)).sorted
      assert(windows.length == 2)
      val expected = windows.flatMap { w =>
        val slice = df.filter(col("_w.start").cast("long") === w)
        Contamination.overlap(slice, "doc_id", "text", evalDf, "eval_id", "text",
            threshold = 0.1, maxPostings = 1000000)
          .collect().map(r => (w, r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), r.getDouble(4)))
      }.toMap
      assert(streamed == expected)
      // sanity: alerts exist in both windows, and only for seeded docs
      assert(streamed.keys.map(_._1).toSet == windows.toSet)
      assert(streamed.keys.forall { case (_, aId, _) => aId % 5 == 0 })
    } finally q.stop()
  }
}
