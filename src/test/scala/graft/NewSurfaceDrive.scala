package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NewSurfaceDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ev = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    // typed Dataset path on real data
    val typed = ev.select($"l_partkey".cast("string").as("v")).as[String]
      .groupByKey(_ => 0)
      .agg(new graft.functions.HllCardinalityAggregator(4096).toColumn)
      .collect()(0)._2
    // salted exact distinct on real data vs naive
    val naive = ev.agg(countDistinct($"l_partkey")).collect()(0).getLong(0)
    val salted = graft.operators.SkewTools
      .saltedCountDistinct(ev.withColumn("one", lit(1)), Seq("one"), "l_partkey", 32)
      .collect()(0).getLong(1)
    println(s"DRIVE typed=$typed naive=$naive salted=$salted")
    // probe: bad k in typed aggregator
    try new graft.functions.HllCardinalityAggregator(3)
    catch { case e: IllegalArgumentException => println("DRIVE badk=" + e.getMessage) }
    spark.stop()
  }
}
