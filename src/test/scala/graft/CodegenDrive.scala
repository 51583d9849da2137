package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CodegenDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.limit(3).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = e.crossJoin(broadcast(q))
      .select(graft.operators.Similarity.dot(col("embedding"), col("qvec")).as("d"))
    println("DRIVE join-rows=" + scored.count() + " sample=" + scored.head().getDouble(0))
    // plain projection: the expression must live inside a WholeStageCodegen span
    val proj = e.select(graft.operators.Similarity.dot(col("embedding"), col("embedding")).as("n2"))
    println("DRIVE proj-sample=" + proj.head().getDouble(0))
    val plan = proj.queryExecution.executedPlan.toString // AQE final after execution
    println("DRIVE proj-wholestage=" + plan.contains("*(1)")) // *(n) = whole-stage span marker
    spark.stop()
  }
}
