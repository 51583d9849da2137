package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** r14 measurement scratch: split each query's wall time into Catalyst
  * planning phases (QueryPlanningTracker), job/stage/task counts, and summed
  * executor run time — to see whether the bench's per-query cost is compute,
  * scheduling, or driver-side planning.
  * Usage: runMain graft.tools.PhaseProbe <q1>[,<q2>...]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new LongAdder; val nTasks = new LongAdder
    val nJobs = new LongAdder; val nStages = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskMs.add(t.taskMetrics.executorRunTime); nTasks.add(1)
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = nJobs.add(1)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = nStages.add(1)
    })
    val names = args(0).split(",").toSeq
    def onePass(name: String, report: Boolean): Unit = {
      taskMs.reset(); nTasks.reset(); nJobs.reset(); nStages.reset()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val tBuilt = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val build = (tBuilt - t0) / 1e9
      if (report) {
        Thread.sleep(300)
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${(v.endTimeMs - v.startTimeMs)}ms" }
          .toSeq.sorted.mkString(" ")
        println(f"PHASE $name wall=$wall%.3f build=$build%.3f cpu=${taskMs.sum() / 1e3}%.2f" +
          f" tasks=${nTasks.sum()} jobs=${nJobs.sum()} stages=${nStages.sum()} | $phases")
      }
    }
    // warm everything twice, then report two passes
    names.foreach(n => onePass(n, report = false))
    names.foreach(n => onePass(n, report = false))
    names.foreach(n => onePass(n, report = true))
    names.foreach(n => onePass(n, report = true))
    spark.stop()
  }
}
