package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness: time a subset of SparkEntry queries in isolation.
  * Usage: runMain graft.tools.Probe <queryName>[,<queryName>...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args(0).split(",").toSeq else Seq("dd_ngram_jaccard")
    def run(name: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (sys.env.contains("SPARK_GRAFT_SHOW")) {
      names.foreach { name =>
        println(s"==== RESULT $name ====")
        graft.SparkEntry.queries(name)(spark, sfDir).show(100, false)
      }
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      names.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save() // let AQE finalize
        println(s"==== PLAN $name ====")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    names.foreach(run)
    names.foreach(run)
    spark.stop()
  }
}
