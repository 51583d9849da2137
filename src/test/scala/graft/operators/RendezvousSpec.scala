package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rendezvous (HRW) sharding: the minimal-movement theorem holds exactly,
  * assignments are balanced, and the md5 basis matches an independent JVM
  * digest (the engine-portability contract the DuckDB oracle relies on).
  */
class RendezvousSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def shards(n: Int, keys: Int): Map[Long, Int] = {
    import spark.implicits._
    (0L until keys.toLong).toDF("k")
      .select(col("k"), Sampling.rendezvousShard(col("k"), n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("growing n to n+1 moves keys ONLY to the new shard, ~1/(n+1) of them") {
    for (n <- Seq(4, 8, 16)) {
      val a = shards(n, 4000)
      val b = shards(n + 1, 4000)
      val moved = a.keys.filter(k => a(k) != b(k))
      moved.foreach(k => assert(b(k) == n, s"key $k moved to ${b(k)}, not the new shard $n"))
      val frac = moved.size.toDouble / 4000
      assert(frac > 0.5 / (n + 1) && frac < 2.0 / (n + 1),
        s"n=$n: moved fraction $frac far from 1/${n + 1}")
    }
  }

  test("assignment is balanced and total") {
    val a = shards(8, 8000)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.keys.toSet == (0 until 8).toSet)
    assert(sizes.values.max < sizes.values.min * 2,
      s"imbalanced: ${sizes.toMap}")
  }

  private def fastShards(n: Int, keys: Int, seed: Long = 0L): Map[Long, Int] = {
    import spark.implicits._
    (0L until keys.toLong).toDF("k")
      .select(col("k"), Sampling.rendezvousShardFast(col("k"), n, seed).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("fast variant: growing n to n+1 moves keys ONLY to the new shard, ~1/(n+1)") {
    for (n <- Seq(4, 8, 16)) {
      val a = fastShards(n, 4000)
      val b = fastShards(n + 1, 4000)
      val moved = a.keys.filter(k => a(k) != b(k))
      moved.foreach(k => assert(b(k) == n, s"key $k moved to ${b(k)}, not the new shard $n"))
      val frac = moved.size.toDouble / 4000
      assert(frac > 0.5 / (n + 1) && frac < 2.0 / (n + 1),
        s"n=$n: moved fraction $frac far from 1/${n + 1}")
    }
  }

  test("fast variant: balanced, total, seed-sensitive, md5-independent") {
    val a = fastShards(8, 8000)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.keys.toSet == (0 until 8).toSet)
    assert(sizes.values.max < sizes.values.min * 2, s"imbalanced: ${sizes.toMap}")
    // a different seed is a different (equally valid) HRW universe
    val b = fastShards(8, 2000, seed = 1L)
    assert((0L until 2000L).count(k => a(k) != b(k)) > 500,
      "seed change barely moved assignments — seed not mixed into the hash")
    // and it is NOT the md5 assignment (different hash by design)
    val md5 = shards(8, 2000)
    assert((0L until 2000L).count(k => a(k) != md5(k)) > 500,
      "fast variant suspiciously agrees with md5 — same hash basis?")
  }

  test("fast variant: SQL surface (hrw_shard) agrees with the DataFrame API") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    (0L until 500L).toDF("k").createOrReplaceTempView("_hrw_keys")
    val viaSql = spark.sql("SELECT k, hrw_shard(k, 8) AS s FROM _hrw_keys")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == fastShards(8, 500))
    // explicit seed arg
    val seeded = spark.sql("SELECT k, hrw_shard(k, 8, 7) AS s FROM _hrw_keys")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(seeded == fastShards(8, 500, seed = 7L))
    // codegen'd, not CodegenFallback: the generated Java must carry the
    // static shard call (a silent janino fallback would hide a broken
    // doGenCode behind identical results)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.HrwShard]))
    import org.apache.spark.sql.execution.debug._
    val gen = viaSqlPlanCode(spark)
    assert(gen.contains("HrwShard$.MODULE$.shardUTF8") || gen.contains("shardUTF8"),
      s"hrw_shard missing from generated code:\n${gen.take(2000)}")
  }

  private def viaSqlPlanCode(spark: org.apache.spark.sql.SparkSession): String =
    // range() always whole-stage-codegens, unlike a LocalTableScan toy plan
    org.apache.spark.sql.execution.debug.codegenString(
      spark.sql("SELECT hrw_shard(CAST(id AS STRING), 8) AS s FROM range(500)")
        .queryExecution.executedPlan)

  test("md5 basis matches an independent JVM digest (engine portability)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = shards(8, 64)
    for ((k, got) <- a) {
      val want = (0 until 8).maxBy(s => hex(s"$k:$s"))
      assert(got == want, s"key $k: $got != $want")
    }
  }
}
