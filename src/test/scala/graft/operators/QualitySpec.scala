package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every constraint type counts its planted violations") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(10.0), "F", "1-URGENT"),
      (Some(2L), Some(20.0), "O", "5-LOW"),
      (Some(2L), Some(-5.0), "X", "9-BOGUS"),   // dup key, range, set, regex
      (None, Some(30.0), "F", "2-HIGH"),        // null key
      (Some(4L), None, "P", "3-MEDIUM")         // null value: range ignores
    ).toDF("k", "v", "status", "pri")
    val report = Quality.check(df, Seq(
        Quality.NotNull("k"),
        Quality.InRange("v", 0, 100),
        Quality.OneOf("status", Seq("F", "O", "P")),
        Quality.Matches("pri", "^[1-5]-"),
        Quality.Unique(Seq("k")),
        Quality.MinRows(10)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(report(("not_null", "k")) == (1L, false))
    assert(report(("in_range[0.0,100.0]", "v")) == (1L, false))
    assert(report(("one_of[F|O|P]", "status")) == (1L, false))
    assert(report(("matches[^[1-5]-]", "pri")) == (1L, false))
    assert(report(("unique", "k")) == (1L, false)) // one extra copy of k=2
    assert(report(("min_rows[10]", "*")) == (5L, false))
    // a clean table passes everything
    val clean = Seq((1L, 5.0, "F", "1-URGENT"), (2L, 6.0, "O", "2-HIGH"))
      .toDF("k", "v", "status", "pri")
    val ok = Quality.check(clean, Seq(
      Quality.NotNull("k"), Quality.InRange("v", 0, 100),
      Quality.Unique(Seq("k")), Quality.MinRows(2)))
    assert(ok.collect().forall(_.getBoolean(3)))
  }

  test("distribution drift: 0 for identical cohorts, 1 for disjoint, exact midpoint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // identical: same values in both cohorts
    val same = (0 until 100).flatMap(i => Seq(("g", true, i % 10), ("g", false, i % 10)))
      .toDF("src", "base", "v")
    val d0 = Quality.distributionDrift(same, "src", col("base"), col("v"))
      .collect().head
    assert(d0.getDouble(3) == 0.0)
    // disjoint: cohorts occupy different bins entirely
    val disj = ((0 until 50).map(i => ("g", true, 1)) ++
      (0 until 50).map(i => ("g", false, 2))).toDF("src", "base", "v")
    assert(Quality.distributionDrift(disj, "src", col("base"), col("v"))
      .collect().head.getDouble(3) == 1.0)
    // half-moved mass: baseline all bin 1; compare 50/50 bins 1,2 -> TVD 0.5
    val half = ((0 until 40).map(_ => ("g", true, 1)) ++
      (0 until 20).map(_ => ("g", false, 1)) ++
      (0 until 20).map(_ => ("g", false, 2))).toDF("src", "base", "v")
    val r = Quality.distributionDrift(half, "src", col("base"), col("v"))
      .collect().head
    assert(r.getLong(1) == 40L && r.getLong(2) == 40L && r.getDouble(3) == 0.5)
  }
}
