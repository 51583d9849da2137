package graftdrive
import org.apache.spark.sql.SparkSession
// Mimics the driver's smoke: vanilla session (no graft configs), entry(), rows>0
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(10, false)
    println("SMOKE rows=" + df.count())
    spark.stop()
  }
}
