package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FastDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val r = li.agg(
      graft.functions.GraftFunctions.hll_cardinality(col("l_partkey"), 4096).as("parity"),
      graft.functions.GraftFunctions.hll_cardinality_fast(col("l_partkey"), 4096).as("fast"),
      countDistinct(col("l_partkey")).as("exact")).collect()(0)
    println(s"DRIVE parity=${r.getDouble(0)} fast=${r.getLong(1)} exact=${r.getLong(2)}")
    // probe: bad k from SQL
    graft.functions.GraftFunctions.registerAll(spark)
    li.createOrReplaceTempView("li")
    try spark.sql("SELECT hll_cardinality(l_partkey, 7) FROM li").collect()
    catch { case e: Exception => println("DRIVE badk-sql=" + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
