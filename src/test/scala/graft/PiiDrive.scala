package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PiiDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // real corpus + injected PII through the public operator API
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("text", concat(col("text"), lit(" reach me: bob@corp.io / 10.0.0.1")))
    val out = d.select(
      graft.operators.TextAnalysis.piiCount(col("text")).as("n"),
      graft.operators.TextAnalysis.redactPii(col("text")).as("r"))
    val agg = out.agg(sum("n"), count(lit(1))).collect()(0)
    val leaked = out.filter(col("r").contains("bob@corp.io") || col("r").contains("10.0.0.1")).count()
    println(s"DRIVE pii-hits=${agg.getLong(0)} docs=${agg.getLong(1)} leaked=$leaked")
    spark.stop()
  }
}
