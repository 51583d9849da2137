package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SessionStreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet("/tmp/stream_in")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val sessions = graft.streaming.StreamingSessionize.sessionize(
      stream, "user_id", "ts", gapMillis = 3600000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_drv").start()
    q.processAllAvailable()
    val n = spark.table("sess_drv").count()
    // batch reference: same gap via the batch sessionizer; streaming emits
    // only watermark-closed sessions, so it must be a subset count
    val batch = graft.operators.Sessionize.sessionStats(
      spark.read.option("mergeSchema","false").parquet("/tmp/stream_in")
        .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long"))),
      "user_id", "ts", 3600).count()
    println(s"DRIVE streaming-sessions=$n batch-sessions=$batch")
    q.stop(); spark.stop()
  }
}
