package graft

import graft.functions.{GraftFunctions, HllCardinalityAggregator, HllSketchAggregator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Coverage for the remaining API surfaces: typed Aggregator, udaf
  * registration, JSON source parity (reference op #16), sink round-trips
  * (op #17), bucketed co-located joins, and salted skew handling.
  */
class SurfacesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${System.getProperty("user.name")}")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dataTokens: Array[String] = {
    val in = getClass.getResourceAsStream("/data.txt")
    try """-?\d+(?:\.\d+)?""".r.findAllIn(Source.fromInputStream(in, "UTF-8").mkString).toArray
    finally in.close()
  }

  test("typed Aggregator surface matches the Catalyst aggregate bit-for-bit") {
    import spark.implicits._
    val ds = spark.createDataset(dataTokens.toSeq)
    // typed groupByKey path
    val typed = ds.groupByKey(_ => 0)
      .agg(new HllCardinalityAggregator(1 << 12).toColumn)
      .collect()(0)._2
    assert(typed == 645.2579301443818)
    // udaf registration path (SQL)
    spark.udf.register("hll_card_udaf", udaf(new HllCardinalityAggregator(1 << 12)))
    ds.toDF("v").createOrReplaceTempView("surf_t")
    val viaUdaf = spark.sql("SELECT hll_card_udaf(v) FROM surf_t").collect()(0).getDouble(0)
    assert(viaUdaf == 645.2579301443818)
    // typed sketch aggregator round-trips through the binary form
    val sk = ds.groupByKey(_.length).agg(new HllSketchAggregator(1 << 12).toColumn).collect()
    val merged = sk.map(_._2).map(graft.hll.HllSketch.deserialize)
      .reduce((a, b) => a.merge(b))
    assert(merged.cardinality == 645.2579301443818)
  }

  test("JSON source parity: reference fixture through Spark JSON machinery (ref op #16)") {
    import spark.implicits._
    val raw = Source.fromInputStream(getClass.getResourceAsStream("/data.txt"), "UTF-8").mkString
    // the fixture is one JSON array; parse with from_json keeping element text
    val df = Seq(raw).toDF("j")
      .select(explode(from_json(col("j"), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))).as("v"))
    assert(df.count() == 775)
    val est = df.agg(GraftFunctions.hll_cardinality(col("v"), 1 << 12)).collect()(0).getDouble(0)
    assert(est == 645.2579301443818,
      "JSON number->string coercion must preserve the literal token text")
  }

  test("sink round-trips preserve estimates (ref op #17): parquet, json, csv, orc") {
    import spark.implicits._
    val df = spark.createDataset(dataTokens.toSeq).toDF("v")
    val base = s"/tmp/graft_sink_${System.nanoTime()}"
    def est(d: org.apache.spark.sql.DataFrame): Double =
      d.agg(GraftFunctions.hll_cardinality(col("v").cast("string"), 1 << 12)).collect()(0).getDouble(0)
    df.write.parquet(s"$base/p")
    df.write.json(s"$base/j")
    df.write.option("header", "true").csv(s"$base/c")
    df.write.orc(s"$base/o")
    assert(est(spark.read.parquet(s"$base/p")) == 645.2579301443818)
    assert(est(spark.read.json(s"$base/j").select(col("v").cast("string").as("v"))) == 645.2579301443818)
    assert(est(spark.read.option("header", "true").csv(s"$base/c")) == 645.2579301443818)
    assert(est(spark.read.orc(s"$base/o")) == 645.2579301443818)
  }

  test("partitioned writes prune at the source: PartitionFilters, not a full scan") {
    // the 100 TB output layout: hive-style partition directories let a
    // reader touch only the partitions its filter names
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = s"/tmp/graft_part_${System.nanoTime()}"
    docs.write.partitionBy("source").parquet(base)
    val one = spark.read.parquet(base).filter(col("source") === "src1")
    val scan = one.queryExecution.executedPlan.toString
    // the source predicate must land in PartitionFilters (directory
    // pruning), NOT PushedFilters (row-group skipping after listing)
    assert(scan.contains("PartitionFilters: [isnotnull(source"),
      s"partition pruning missing:\n$scan")
    val expected = docs.filter(col("source") === "src1").count()
    assert(one.count() == expected && expected > 0)
  }

  test("stored sketch tables re-aggregate after a parquet round-trip") {
    // the big scale lever: persist per-group sketches once, answer coarser
    // rollups later from the stored (possibly sparse-serialized) bytes
    import spark.implicits._
    val df = spark.createDataset(dataTokens.toSeq).toDF("v")
    val base = s"/tmp/graft_sketch_store_${System.nanoTime()}"
    df.groupBy(length(col("v")).as("g"))
      .agg(GraftFunctions.hll_sketch_agg(col("v"), 1 << 12).as("sk"))
      .write.parquet(base)
    val rolled = spark.read.parquet(base)
      .agg(GraftFunctions.hll_estimate(GraftFunctions.hll_union_agg(col("sk"))))
      .collect()(0).getDouble(0)
    assert(rolled == 645.2579301443818)
    // a max-precision sketch of few values must store sparse (small bytes)
    val tiny = spark.createDataset(Seq("a", "b", "c")).toDF("v")
      .agg(GraftFunctions.hll_sketch_agg(col("v"), 1 << 18).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(tiny.length < 100, s"expected sparse bytes, got ${tiny.length}")
  }

  test("bucketed tables co-locate the join: no exchange before the join") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    // a metastore-less previous JVM can leave orphaned locations behind
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("orders_b", "customer_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    o.write.bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    c.write.bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    val joined = spark.table("orders_b").hint("merge")
      .join(spark.table("customer_b").hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(sum(col("o_totalprice")).as("rev"))
    val p = joined.queryExecution.executedPlan.toString
    // bucketing must eliminate shuffle on the join keys: the only exchange
    // allowed is the one for the final groupBy
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SMJ over bucketed tables:\n$p")
    val beforeJoin = p.substring(joinIdx)
    assert(!beforeJoin.contains("Exchange hashpartitioning(o_custkey") &&
           !beforeJoin.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join still shuffles:\n$p")
    // result parity with the plain join
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(sum(col("o_totalprice")).as("rev"))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
    val bucketed = joined.collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
    assert(plain == bucketed)
  }

  test("salted count-distinct equals naive count-distinct (incl. a hot key)") {
    import spark.implicits._
    // hot key: one group holds 90% of rows
    val rows = (0 until 50000).map { i =>
      val g = if (i % 10 == 0) s"g${i % 5}" else "hot"
      (g, s"v${i % 7000}")
    }
    val df = rows.toDF("g", "v")
    val naive = df.groupBy("g").agg(count_distinct(col("v")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.operators.SkewTools.saltedCountDistinct(df, Seq("g"), "v", buckets = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(naive == salted)
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    val big = (0 until 20000).map(i => (if (i % 4 == 0) 1L else (i % 100).toLong, i))
      .toDF("k", "payload")
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k2", "name")
    val plain = big.join(small, big("k") === small("k2")).count()
    val salted = graft.operators.SkewTools.saltedJoin(big, small, "k", "k2", buckets = 8).count()
    assert(plain == salted)
  }

  test("ANALYZE TABLE statistics reach the optimizer's cost model") {
    import spark.implicits._
    val t = "graft_stats_probe"
    (0 until 5000).map(i => (i.toLong, s"v${i % 7}")).toDF("id", "cat")
      .write.mode("overwrite").saveAsTable(t)
    try {
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS id, cat")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // row count flows into the plan's cost statistics...
      val stats = spark.table(t).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(5000)), s"stats=$stats")
      // ...and per-column NDVs are recorded for join/filter estimation
      val catStats = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
        .stats.get
      assert(catStats.colStats("cat").distinctCount.exists(_.toInt == 7))
      // ANALYZE computes NDV via HLL++ at a coarse default precision —
      // allow its documented error band rather than a tight tolerance
      assert(catStats.colStats("id").distinctCount.exists(n => (n.toInt - 5000).abs < 1000),
        s"id ndv=${catStats.colStats("id").distinctCount}")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("observe() collects pipeline telemetry without a second pass") {
    import spark.implicits._
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    // the free-metrics surface a 100 TB pipeline needs: row counts and
    // quality tallies ride the ONE existing action instead of re-scanning
    val obs = Observation("ingest_stats")
    val df = (0 until 1000).map(i => (i.toLong, if (i % 10 == 0) null else s"d$i"))
      .toDF("id", "text")
      .observe(obs, count(lit(1)).as("n_rows"),
        count(col("text")).as("n_nonnull"),
        sum(length(col("text"))).as("total_chars"))
    val kept = df.filter(col("text").isNotNull).count()
    val m = obs.get
    assert(m("n_rows") == 1000L && m("n_nonnull") == 900L && kept == 900L)
    assert(m("total_chars").asInstanceOf[Long] > 0L)
  }
}
