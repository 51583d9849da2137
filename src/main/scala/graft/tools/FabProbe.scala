package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder
import graft.operators.{Multimodal, Tar, Ingest}

/** r14 scratch: isolate the per-task cost difference between
  * groupByKey.mapGroups (serial under AQE coalescing) and
  * repartition.mapPartitions (parallel) tar fabrication.
  */
object FabProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val taskMs = new LongAdder; val nTasks = new LongAdder; val gcMs = new LongAdder
    val deserMs = new LongAdder; val serMs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskMs.add(t.taskMetrics.executorRunTime); nTasks.add(1)
        gcMs.add(t.taskMetrics.jvmGCTime)
        deserMs.add(t.taskMetrics.executorDeserializeTime)
        serMs.add(t.taskMetrics.resultSerializationTime)
      }
    })
    def mk(aid: Long, docs: Seq[(Long, String, String)]): Multimodal.MediaRecord = {
      val entries = docs.sortBy(_._1).map { case (id, source, text) =>
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Tar.TarEntry(s"$source/$id.txt", body.length.toLong, '0', body)
      }
      Multimodal.MediaRecord(aid, s"fake://tar/$aid.tar", "application/x-tar",
        Tar.writeTar(entries), Map.empty)
    }
    def base() = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
    def viaGroupByKey() = base()
      .groupByKey(_._1 / 16)
      .mapGroups((aid, it) => mk(aid, it.toSeq))
    def viaRepartition(n: Int) = base()
      .repartition(n, (col("doc_id") / 16).cast("long"))
      .mapPartitions(it => it.toSeq.groupBy(_._1 / 16).iterator.map {
        case (aid, docs) => mk(aid, docs) })
    def time(label: String)(df: => org.apache.spark.sql.Dataset[_]): Unit = {
      taskMs.reset(); nTasks.reset(); gcMs.reset(); deserMs.reset(); serMs.reset()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"FAB $label wall=$wall%.3f cpu=${taskMs.sum() / 1e3}%.2f" +
        f" gc=${gcMs.sum() / 1e3}%.2f deser=${deserMs.sum() / 1e3}%.2f" +
        f" tasks=${nTasks.sum()}")
    }
    // warm
    (1 to 3).foreach { _ => viaGroupByKey().write.format("noop").mode("overwrite").save()
      viaRepartition(32).write.format("noop").mode("overwrite").save() }
    (1 to 3).foreach { i =>
      time(s"groupByKey-$i") { viaGroupByKey() }
      time(s"repart32-$i") { viaRepartition(32) }
      time(s"repart8-$i") { viaRepartition(8) }
    }
    spark.stop()
  }
}
