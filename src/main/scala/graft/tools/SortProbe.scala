package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** r14 measurement scratch: quantify the range-partitioner double-compute on
  * fabrication-heavy map-only lanes ending in a global orderBy. The sort's
  * RangePartitioner runs a separate sampling job over the child RDD before
  * the shuffle map job runs it again — an unmaterialized expensive lineage
  * is computed twice (guide §2.4: "an orderBy used only to make output
  * deterministic").
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskCpu = new LongAdder // executor run time, ms
    val nTasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskCpu.add(t.taskMetrics.executorRunTime)
        nTasks.add(1)
      }
    })
    val ing = graft.operators.Ingest

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      taskCpu.reset(); nTasks.reset()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat
      Thread.sleep(200)
      println(f"SORTPROBE $label wall=$wall%.3f s cpu=${taskCpu.sum() / 1e3}%.2f s tasks=${nTasks.sum()}")
    }

    def base() = ing.ingestTar(ing.tarArchivesFromDocuments(spark, sfDir))
      .select(col("archive_id"), col("name"), col("size"))

    // long warm-up: JIT to steady state
    (1 to 6).foreach { _ => noop(base().orderBy(col("name"))) }

    (1 to 4).foreach { i =>
      time(s"asis-$i") { noop(base().orderBy(col("name"))) }
      time(s"nosort-$i") { noop(base()) }
      time(s"ckpt-$i") { noop(base().localCheckpoint(false).orderBy(col("name"))) }
    }
    spark.stop()
  }
}
