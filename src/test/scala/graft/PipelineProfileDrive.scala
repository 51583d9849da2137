package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dd_pipeline_stats sub-steps (not a test). */
object PipelineProfileDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // warm-up
    d.count()

    for (lap <- 1 to 2) {
      println(s"--- lap $lap ---")
      val scored = time("score+checkpoint") {
        d.withColumn("q", graft.operators.TextAnalysis.qualityScore(col("text")))
          .withColumn("lang_pred", graft.operators.TextAnalysis.langId(col("text")))
          .localCheckpoint(true)
      }
      time("funnel-agg") {
        scored.agg(count(lit(1)), sum(when(col("q") >= 0.5, 1L).otherwise(0L))).collect()
      }
      val langKept = scored.filter(col("q") >= 0.5 && col("lang_pred") =!= "und")
      val pairs = time("lsh-pairs-plan") {
        graft.operators.Dedup.minhashNearDupPairs(langKept, "text", "doc_id",
          64, 16, 3, 0.5, 1000)
      }
      val mat = time("pairs-checkpoint") {
        pairs.select(col("id1").cast("long"), col("id2").cast("long")).localCheckpoint(true)
      }
      time("pairs-count") { println("  edges=" + mat.count()) }
      time("pairs-collect") { mat.collect() }
      val comp = time("components") { graft.operators.Dedup.connectedComponents(mat) }
      time("anti-join-count") {
        val drop = comp.filter(col("id") =!= col("cluster")).select(col("id").as("_drop"))
        langKept.join(drop, langKept("doc_id") === col("_drop"), "left_anti").count()
      }
    }
    spark.stop()
  }
}
