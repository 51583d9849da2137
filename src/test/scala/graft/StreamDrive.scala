package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// Drives StreamingHll through a real file-source streaming query over the
// events parquet (the library's public surface), not a test fixture.
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet("/tmp/stream_in")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val agg = graft.streaming.StreamingHll.windowedDistinct(
      stream, "ts", "user_id", "1 day", "1 hour", k = 4096, extraGroups = Seq("event_type"))
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("drv").start()
    q.processAllAvailable()
    val rows = spark.table("drv").orderBy(col("window.start"), col("event_type"))
    rows.show(8, false)
    println("DRIVE streaming rows=" + rows.count())
    q.stop(); spark.stop()
  }
}
