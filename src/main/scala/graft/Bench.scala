package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // force FULL output materialization: count() lets Catalyst prune every
    // unreferenced projection, so map-heavy queries would be timed as little
    // more than a scan; the noop sink evaluates every output column
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warm-up lap: JVM/codegen/parquet-footer caches, so timed numbers
    // reflect steady-state per-query cost rather than first-query startup
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => }
    }
    // two timed laps, keep the per-query minimum: damps scheduler/GC noise
    // on shared hosts without hiding real per-query cost. Failures go to
    // stderr — a crashing query would otherwise read as a fast one.
    def lap(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { run(fn) } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (l1, l2) = (lap(), lap())
    val results = l1.map { case (name, v) => name -> math.min(v, l2(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
