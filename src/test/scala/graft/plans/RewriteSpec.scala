package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.install(s)
    s
  }

  test("flag off: exact count distinct untouched") {
    import spark.implicits._
    spark.conf.set("spark.graft.rewrite.approxDistinct", "false")
    val df = (1 to 10000).map(i => s"u${i % 777}").toDF("v")
    val n = df.agg(countDistinct(col("v"))).collect()(0).getLong(0)
    assert(n == 777L)
  }

  test("flag on: count distinct becomes the HLL estimate, expand-free plan") {
    import spark.implicits._
    spark.conf.set("spark.graft.rewrite.approxDistinct", "true")
    try {
      val df = (1 to 10000).map(i => s"u${i % 777}").toDF("v")
      val q = df.agg(countDistinct(col("v")).as("d"))
      val got = q.collect()(0).getLong(0)
      // the HLL estimate for 777 distinct at k=4096, cast to long
      val expected = df.agg(graft.functions.GraftFunctions
        .hll_cardinality(col("v"), 4096)).collect()(0).getDouble(0).toLong
      assert(got == expected && math.abs(got - 777L) <= 777 * 0.05)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"), s"expand not eliminated:\n$plan")
      assert(plan.contains("hll_cardinality"), s"rewrite missing:\n$plan")
    } finally spark.conf.set("spark.graft.rewrite.approxDistinct", "false")
  }

  test("grouped and filtered aggregates: only plain distinct counts rewrite") {
    import spark.implicits._
    spark.conf.set("spark.graft.rewrite.approxDistinct", "true")
    try {
      val df = (1 to 9000).map(i => (s"g${i % 3}", s"u${i % 500}")).toDF("g", "v")
      val rows = df.groupBy("g")
        .agg(countDistinct(col("v")).as("d"), count(lit(1)).as("n"))
        .orderBy("g").collect()
      rows.foreach { r =>
        assert(math.abs(r.getLong(1) - 500L) <= 25, s"group ${r.getString(0)}: ${r.getLong(1)}")
        assert(r.getLong(2) == 3000L) // plain count untouched
      }
      // multi-arg COUNT(DISTINCT a, b) rewrites too (the worst Expand case):
      // approximate answer, expand-free plan, null tuples skipped like COUNT
      val withNulls = df.union(Seq((null.asInstanceOf[String], "x"),
        ("g0", null.asInstanceOf[String])).toDF("g", "v"))
      val mq = withNulls.agg(countDistinct(col("g"), col("v")).as("d"))
      val multi = mq.collect()(0).getLong(0)
      assert(math.abs(multi - 1500L) <= 1500 * 0.05, s"multi-arg estimate $multi")
      val mplan = mq.queryExecution.executedPlan.toString
      assert(!mplan.contains("Expand") && mplan.contains("hll_cardinality"),
        s"multi-arg rewrite missing:\n$mplan")
      // FILTER-clause distinct aggregates stay exact (scope guard)
      df.createOrReplaceTempView("rw_t")
      val filtered = spark.sql(
        "SELECT COUNT(DISTINCT v) FILTER (WHERE g = 'g0') FROM rw_t")
      assert(filtered.collect()(0).getLong(0) == 500L)
    } finally spark.conf.set("spark.graft.rewrite.approxDistinct", "false")
  }
}
