package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Normalized physical-plan shapes for every contract query: the operator
  * tree with expression ids, statistics, and codegen ids stripped — stable
  * across runs, diffable across rounds. `PlanSnapshotSpec` compares the
  * live shapes against the checked-in snapshot, so an optimizer-visible
  * regression (a lost broadcast, a new exchange, a dropped WindowGroupLimit)
  * fails CI with a readable tree diff instead of a benchmark mystery.
  * Regenerate after INTENDED plan changes with
  * `sbt 'Test/runMain graft.PlanSnapshotDrive'` and review the diff.
  */
object PlanShape {

  def shape(plan: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = p match {
      // AQE root hides the actual tree behind a field, not children
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan, depth)
      case _ =>
        val name = p.getClass.getSimpleName.stripSuffix("Exec").stripSuffix("$")
        sb.append("  " * depth).append(name).append('\n')
        p.children.foreach(walk(_, depth + 1))
    }
    walk(plan, 0)
    sb.toString
  }

  def snapshotFor(spark: SparkSession, dir: String): String = {
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      s"===== $name =====\n" + shape(fn(spark, dir).queryExecution.executedPlan)
    }.mkString
  }

  val snapshotPath = "src/test/resources/plan_snapshots.txt"
  val dataDir = "/root/testdata/sf0.001"
}

/** Regenerates the checked-in plan-shape snapshot. */
object PlanSnapshotDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(PlanShape.snapshotPath),
      PlanShape.snapshotFor(spark, PlanShape.dataDir))
    println(s"wrote ${PlanShape.snapshotPath}")
    spark.stop()
  }
}
