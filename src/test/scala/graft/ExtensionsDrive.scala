package graftdrive
import org.apache.spark.sql.SparkSession
// Proves the spark.sql.extensions deployment path end-to-end in a fresh
// JVM: a session built with GraftExtensions must resolve every graft SQL
// function WITHOUT GraftFunctions.registerAll, and must apply the opt-in
// COUNT(DISTINCT) -> HLL rewrite.
object ExtensionsDrive {
  def main(args: Array[String]): Unit = {
    // the REAL conf path — classname string, reflective no-arg
    // instantiation, classloader resolution — not .withExtensions(instance)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until 5000).map(i => s"u${i % 1234}").toDF("v").createOrReplaceTempView("t")
    // every registered function resolves from SQL with zero registerAll calls
    val est = spark.sql(
      "SELECT kmv_estimate(kmv_union_agg(sk)) FROM (SELECT kmv_sketch_agg(v, 2048) AS sk FROM t)")
      .collect()(0).getDouble(0)
    assert(est == 1234.0, s"kmv via extensions: $est")
    val hll = spark.sql("SELECT hll_cardinality(v, 4096) FROM t").collect()(0).getDouble(0)
    assert(math.abs(hll - 1234) / 1234.0 < 0.05, s"hll via extensions: $hll")
    val nFuncs = graft.functions.GraftFunctions.sqlFunctions.count { case (name, _) =>
      spark.sessionState.catalog.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    }
    assert(nFuncs == graft.functions.GraftFunctions.sqlFunctions.size,
      s"only $nFuncs functions resolved")
    // the rewrite rule is injected: opt in and check the plan swaps
    // COUNT(DISTINCT) for the HLL aggregate
    spark.conf.set("spark.graft.rewrite.approxDistinct", "true")
    val plan = spark.sql("SELECT COUNT(DISTINCT v) FROM t")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("hll_cardinality"), s"rewrite not applied:\n$plan")
    println(s"EXTDRIVE ok: ${nFuncs} functions + rewrite via spark.sql.extensions")
    spark.stop()
  }
}
