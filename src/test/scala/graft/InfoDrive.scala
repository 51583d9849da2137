package graftdrive
import org.apache.spark.sql.SparkSession
object InfoDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("li")
    spark.sql("SELECT i.* FROM (SELECT hll_info(hll_sketch_agg(l_partkey, 250, 32)) AS i FROM li)").show(false)
    spark.stop()
  }
}
