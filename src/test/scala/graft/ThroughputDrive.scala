package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// Throughput measurement at 20M rows: SHA-1 parity path vs builtin fast path.
object ThroughputDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 20000000L
    val df = spark.range(n).select((col("id") % 5000000L).as("v"))
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"DRIVE $label: $s%.2f s = ${n / s / 1e6}%.1f M rows/s")
    }
    time("parity-sha1")(df.agg(graft.functions.GraftFunctions.hll_cardinality(col("v"), 4096)).collect())
    time("fast-hllpp")(df.agg(graft.functions.GraftFunctions.hll_cardinality_fast(col("v"), 4096)).collect())
    time("exact-distinct")(df.agg(countDistinct(col("v"))).collect())
    time("kmv-1024")(df.agg(graft.functions.GraftFunctions.kmv_estimate(
      graft.functions.GraftFunctions.kmv_sketch_agg(col("v"), 1024))).collect())
    spark.stop()
  }
}
