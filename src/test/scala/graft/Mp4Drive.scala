package graftdrive

import org.apache.spark.sql.SparkSession

/** One-off driver for the mm_mp4_frames contract query at sf0.001:
  * prints the rows so container parity is visible without a full Verify.
  */
object Mp4Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("mm_mp4_frames")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val bad = rows.filterNot(_.getAs[Boolean]("container_parity"))
    println(s"MP4DRIVE rows=${rows.length} parity_failures=${bad.length}")
    bad.take(5).foreach(r => println(s"MP4DRIVE bad: $r"))
    spark.stop()
  }
}
