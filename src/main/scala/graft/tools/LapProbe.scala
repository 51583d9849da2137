package graft.tools

import org.apache.spark.sql.SparkSession

/** Lap-state bisector for the bench-inflation hunt (r11 verdict #1):
  * q_profile_deep / tx_html_metadata run 2.5-3x slower inside the 239-query
  * bench lap than in a fresh JVM, and the inflation survives the 2-lap min.
  * This tool walks the lap in the EXACT `SparkEntry.queries` iteration order
  * (the order Bench uses), re-timing the target queries every `chunk`
  * queries and printing heap + cached-RDD telemetry, so whatever lap state
  * degrades them shows up as the prefix after which the re-time jumps.
  *
  * Usage: runMain graft.tools.LapProbe [targets=a,b] [chunk=20] [stop=name]
  */
object LapProbe {
  def main(args: Array[String]): Unit = {
    val opts = args.flatMap { a =>
      a.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    val targets = opts.getOrElse("targets", "q_profile_deep,tx_html_metadata").split(",").toSeq
    val chunk = opts.getOrElse("chunk", "20").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def telemetry(): String = {
      val rt = Runtime.getRuntime
      val usedMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      val heapMb = rt.totalMemory() / (1024 * 1024)
      val infos = spark.sparkContext.getRDDStorageInfo
      val cachedMb = infos.map(_.memSize).sum / (1024 * 1024)
      f"heap ${usedMb}M/${heapMb}M cachedRDDs ${infos.length} (${cachedMb}M)"
    }
    def timeTargets(tag: String): Unit = targets.foreach { t =>
      val s = run(t)
      println(f"TARGET $t%-20s $s%6.2f s  after=$tag%-24s ${telemetry()}")
    }

    // warm these first (codegen/footers), matching Bench's warm lap for them
    targets.foreach(run); timeTargets("WARM-BASELINE")

    val order = graft.SparkEntry.queries.keys.toSeq // HashMap order == Bench lap order
    println(s"LAP ORDER (${order.size}): " + order.mkString(","))
    val stop = opts.get("stop")
    var done = 0
    val it = order.iterator
    var halted = false
    while (it.hasNext && !halted) {
      val name = it.next()
      if (!targets.contains(name)) {
        val s = try run(name) catch { case e: Throwable =>
          println(s"LAPFAIL $name ${e.getMessage}"); 0.0 }
        done += 1
        if (s > 2.0) println(f"  (lap $done%3d $name%-24s $s%5.2f s)")
        if (done % chunk == 0) timeTargets(s"$done:$name")
        if (stop.contains(name)) halted = true
      }
    }
    timeTargets("FULL-LAP")
    spark.stop()
  }
}
