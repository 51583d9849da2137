package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: dump the minhash LSH physical plan (not a test). */
object LshPlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val pairs = graft.operators.Dedup.minhashNearDupPairs(d, "text", "doc_id",
      64, 16, 3, 0.5, 1000)
    pairs.collect() // run so AQE final plan materializes
    println(pairs.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
