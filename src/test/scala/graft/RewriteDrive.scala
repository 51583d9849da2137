package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RewriteDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    val df = spark.range(20000000L).select(concat(lit("user"), (col("id") % 3000000L)).as("v"), (col("id") % 50).as("g"))
    def run(): Long = df.groupBy("g").agg(countDistinct(col("v"))).collect().map(_.getLong(1)).sum
    def time(label: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime(); val r = f
      println(f"DRIVE $label: ${(System.nanoTime()-t0)/1e9}%.2f s (sum=$r)")
    }
    spark.conf.set("spark.graft.rewrite.approxDistinct", "false")
    time("exact-countDistinct")(run())
    spark.conf.set("spark.graft.rewrite.approxDistinct", "true")
    time("rewritten-to-hll")(run())
    spark.stop()
  }
}
