package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** r14 measurement scratch: Bench-shaped lap (same order, same noop sink)
  * that records per query wall seconds, summed task CPU, task/job/stage
  * counts, and the max single-task run time — to locate (a) job-count-bound
  * queries, (b) hot loops serialized on one task, (c) real CPU hogs.
  * Output: /tmp/bench_profile.tsv
  */
object BenchProfile {
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
    val gcMs = new LongAdder
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val rt = t.taskMetrics.executorRunTime
        taskMs.add(rt); nTasks.add(1); gcMs.add(t.taskMetrics.jvmGCTime)
        maxTask.updateAndGet(m => math.max(m, rt))
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = nJobs.add(1)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = nStages.add(1)
    })
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warm-up lap like Bench
    graft.SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => }
    }
    val sb = new StringBuilder("query\twall_s\tcpu_s\tgc_s\ttasks\tjobs\tstages\tmax_task_s\n")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      taskMs.reset(); nTasks.reset(); nJobs.reset(); nStages.reset(); gcMs.reset()
      maxTask.set(0)
      val t0 = System.nanoTime()
      try {
        run(fn)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(120) // let listener drain
        sb.append(f"$name\t$wall%.3f\t${taskMs.sum() / 1e3}%.2f\t${gcMs.sum() / 1e3}%.2f" +
          f"\t${nTasks.sum()}\t${nJobs.sum()}\t${nStages.sum()}\t${maxTask.get() / 1e3}%.2f\n")
      } catch { case e: Throwable =>
        sb.append(s"$name\tFAILED\t${e.getMessage}\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/bench_profile.tsv"), sb.toString)
    println("BENCHPROFILE done -> /tmp/bench_profile.tsv")
    spark.stop()
  }
}
