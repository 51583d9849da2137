package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** cms_union_agg / topk_union_agg — the warehouse rollups that completed
  * the family (HLL/KMV/GK already had theirs): merged stored sketches must
  * equal the single-pass sketch, independent of partitioning; parameter
  * mismatches fail loudly; all-null groups follow the empty-bytes
  * convention end to end (query/export/import).
  */
class SketchUnionAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cms: daily rollup == single-pass sketch, byte-identical, any partitioning") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i % 13, s"key${i % 211}")).toDF("day", "k")
    val direct = df.agg(GraftFunctions.cms_sketch_agg(col("k"), 5, 512))
      .collect().head.getAs[Array[Byte]](0)
    for (parts <- Seq(1, 7)) {
      val merged = df.repartition(parts)
        .groupBy("day").agg(GraftFunctions.cms_sketch_agg(col("k"), 5, 512).as("sk"))
        .agg(GraftFunctions.cms_union_agg(col("sk")))
        .collect().head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(merged, direct), s"parts=$parts")
    }
  }

  test("cms: mixed (depth, width) inputs fail loudly") {
    import spark.implicits._
    val a = Seq("x").toDF("k").agg(GraftFunctions.cms_sketch_agg(col("k"), 5, 512).as("sk"))
    val b = Seq("y").toDF("k").agg(GraftFunctions.cms_sketch_agg(col("k"), 5, 1024).as("sk"))
    val e = intercept[Exception] {
      a.unionByName(b).agg(GraftFunctions.cms_union_agg(col("sk"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("topk: mixed capacities fail loudly") {
    import spark.implicits._
    val a = Seq("x").toDF("k").agg(GraftFunctions.topk_sketch_agg(col("k"), 64).as("sk"))
    val b = Seq("y").toDF("k").agg(GraftFunctions.topk_sketch_agg(col("k"), 128).as("sk"))
    val e = intercept[Exception] {
      a.unionByName(b).agg(GraftFunctions.topk_union_agg(col("sk"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("topk: daily rollup stays exact at capacity >= distinct, any partitioning") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i % 13, s"t${i % 23}")).toDF("day", "k")
    val want = (0 until 20000).groupBy(i => s"t${i % 23}").view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val entries = df.repartition(parts)
        .groupBy("day").agg(GraftFunctions.topk_sketch_agg(col("k"), 64).as("sk"))
        .agg(GraftFunctions.topk_export(
          GraftFunctions.topk_union_agg(col("sk"))).as("w"))
        .collect().head.getStruct(0).getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(entries == want, s"parts=$parts")
    }
  }

  test("topk: over-capacity rollup keeps the guaranteed heavy hitter") {
    import spark.implicits._
    // 3 daily sketches, capacity 4, 10 distinct keys; 'heavy' holds > n/4
    val rows = (0 until 900).map(i => (i % 3, "heavy")) ++
      (0 until 600).map(i => (i % 3, s"light${i % 9}"))
    val df = rows.toDF("day", "k")
    val entries = df.groupBy("day").agg(GraftFunctions.topk_sketch_agg(col("k"), 4).as("sk"))
      .agg(GraftFunctions.topk_export(GraftFunctions.topk_union_agg(col("sk"))).as("w"))
      .collect().head.getStruct(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(entries.nonEmpty && entries.head._1 == "heavy")
    assert(entries.head._2 <= 900L) // MG never overcounts
  }

  test("profileDeep survives an all-null categorical column (empty MG export)") {
    import spark.implicits._
    val df = Seq((1.0, Option.empty[String]), (2.0, None), (3.0, None))
      .toDF("x", "c")
    val rows = graft.operators.Profile.profileDeep(df,
        numeric = Seq("x"), categorical = Seq("c"))
      .orderBy("col_name").collect()
    assert(rows.length == 2)
    val cRow = rows.find(_.getString(0) == "c").get
    assert(cRow.isNullAt(cRow.fieldIndex("top_value"))) // null, not a crash
    assert(cRow.getLong(cRow.fieldIndex("n_nulls")) == 3L)
  }

  test("all-null groups follow the empty-bytes convention end to end") {
    import spark.implicits._
    val df = Seq.fill(5)(Option.empty[Array[Byte]]).toDF("sk")
    val row = df.agg(GraftFunctions.cms_union_agg(col("sk")).as("c"),
        GraftFunctions.topk_union_agg(col("sk")).as("t"))
      .select(
        length(col("c")).as("cl"), length(col("t")).as("tl"),
        GraftFunctions.cms_query(col("c"), lit("anything")).as("q"),
        GraftFunctions.cms_import(GraftFunctions.cms_export(col("c"))).as("ci"),
        GraftFunctions.topk_import(GraftFunctions.topk_export(col("t"))).as("ti"))
      .collect().head
    assert(row.getInt(0) == 0 && row.getInt(1) == 0)
    assert(row.getLong(2) == 0L) // empty sketch never counted anything
    assert(row.getAs[Array[Byte]](3).isEmpty && row.getAs[Array[Byte]](4).isEmpty)
  }
}
