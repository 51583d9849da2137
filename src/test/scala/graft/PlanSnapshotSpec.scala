package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-drift gate: every contract query's physical operator tree must
  * match the checked-in snapshot (see [[PlanShape]]). An INTENDED plan
  * change regenerates via `sbt 'Test/runMain graft.PlanSnapshotDrive'`;
  * an unintended one fails here with the per-query tree diff.
  */
class PlanSnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sections(s: String): Map[String, String] =
    s.split("(?m)^===== ").filter(_.nonEmpty).map { block =>
      val nl = block.indexOf('\n')
      block.substring(0, nl).stripSuffix(" =====").trim -> block.substring(nl + 1)
    }.toMap

  test("physical plan shapes match the checked-in snapshot") {
    val path = java.nio.file.Paths.get(PlanShape.snapshotPath)
    assert(java.nio.file.Files.exists(path),
      s"missing snapshot — run: sbt 'Test/runMain graft.PlanSnapshotDrive'")
    val want = sections(java.nio.file.Files.readString(path))
    val got = sections(PlanShape.snapshotFor(spark, PlanShape.dataDir))
    val missing = got.keySet -- want.keySet
    assert(missing.isEmpty,
      s"queries without snapshots (regenerate): ${missing.toSeq.sorted.mkString(", ")}")
    val stale = want.keySet -- got.keySet
    assert(stale.isEmpty,
      s"snapshots for removed queries (regenerate): ${stale.toSeq.sorted.mkString(", ")}")
    val drifted = got.keys.toSeq.sorted.flatMap { name =>
      if (got(name) == want(name)) None
      else Some(s"--- $name ---\nexpected:\n${want(name)}\nactual:\n${got(name)}")
    }
    assert(drifted.isEmpty,
      s"${drifted.size} plan(s) drifted — if intended, regenerate via " +
        s"PlanSnapshotDrive and review:\n${drifted.mkString("\n")}")
  }
}
