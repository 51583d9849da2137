package graft.tools

import org.apache.spark.sql.SparkSession

/** r14 measurement scratch: the fixed cost of one Spark job / one SQL noop
  * action at local[32], to size the scheduling overhead in Bench's 2267
  * jobs.
  */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sc = spark.sparkContext
    def bench(label: String, n: Int)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"JOBFLOOR $label ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/op")
    }
    val rdd32 = sc.parallelize(1 to 32, 32)
    val rdd1 = sc.parallelize(1 to 1, 1)
    bench("rdd-count-1task", 50) { rdd1.count() }
    bench("rdd-count-32task", 50) { rdd32.count() }
    val df = spark.range(32)
    bench("df-noop-range", 30) { df.write.format("noop").mode("overwrite").save() }
    val dfAgg = spark.range(1000).groupBy(($"id" % 7).as("k")).count()
    bench("df-noop-agg(1 exchange)", 30) { dfAgg.write.format("noop").mode("overwrite").save() }
    val dfSort = spark.range(1000).orderBy($"id".desc)
    bench("df-noop-sort", 30) { dfSort.write.format("noop").mode("overwrite").save() }
    val parq = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    bench("parquet-scan-noop", 30) { parq.write.format("noop").mode("overwrite").save() }
    bench("localCheckpoint(df32)", 20) { df.localCheckpoint() }
    bench("collect-32", 30) { df.collect() }
    spark.stop()
  }
}
