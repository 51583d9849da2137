package graft.functions
// in-package: builds sketches directly via GkBuffer / TopKSketch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GK and Misra-Gries row wires (WIRE.md): byte/semantic roundtrips,
  * validation of corrupt wires, and the classic-GK rank replay staying
  * inside the relErr*n guarantee on real multi-partition sketches.
  */
class GkTopkWireSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def gkOf(values: Seq[Double], relErr: Double, chunks: Int): GkBuffer = {
    val parts = values.grouped(math.max(1, values.length / chunks)).toSeq
    val bufs = parts.map { p => val b = new GkBuffer(relErr); p.foreach(b.add); b }
    bufs.reduce((a, b) => a.merge(b))
  }

  test("gk export/import roundtrip is byte-identical (incl. merged sketches)") {
    val rnd = new scala.util.Random(5)
    for (chunks <- Seq(1, 7)) {
      val b = gkOf(Seq.fill(20000)(rnd.nextDouble() * 100), 0.01, chunks)
      val bytes = b.serialize()
      val rt = spark.range(1).select(
          GraftFunctions.gk_import(GraftFunctions.gk_export(lit(bytes))).as("b"))
        .collect().head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(rt, bytes), s"chunks=$chunks")
    }
  }

  test("gk import rejects out-of-order tuples and corrupt g sums") {
    import spark.implicits._
    def imp(count: Long, tuples: Seq[(Double, Long, Long)]) =
      Seq((0.01, 10000, count, tuples)).toDF("rel_err", "threshold", "count", "tuples")
        .select(GraftFunctions.gk_import(
          struct(col("rel_err"), col("threshold"), col("count"),
            col("tuples").cast("array<struct<v:double,g:bigint,delta:bigint>>"))))
        .collect()
    // valid two-tuple summary imports fine
    imp(2L, Seq((1.0, 1L, 0L), (2.0, 1L, 0L)))
    intercept[Exception](imp(2L, Seq((2.0, 1L, 0L), (1.0, 1L, 0L)))) // order
    intercept[Exception](imp(1L, Seq((1.0, 2L, 0L))))                // g > count
    intercept[Exception](imp(2L, Seq((1.0, -1L, 0L), (2.0, 1L, 0L)))) // neg g
  }

  test("classic rank replay from exported tuples stays within relErr*n") {
    // the post-compress invariant max(g+delta) <= 2*relErr*n makes the
    // classic first-match rule always land a tuple whose true-rank bracket
    // intersects rank +- relErr*n; verify on skewed + uniform data
    val rnd = new scala.util.Random(17)
    val datasets = Seq(
      Seq.fill(30000)(rnd.nextDouble() * 1000),
      Seq.fill(30000)(math.pow(rnd.nextDouble(), 8) * 1000)) // heavy skew
    for (values <- datasets; q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val relErr = 0.01
      val b = gkOf(values, relErr, 5)
      val s = b.compressed()
      val n = s.count
      val rank = math.ceil(q * n).toLong
      val eps = relErr * n
      // replay exactly as the contract query does
      var minRank = 0L
      var answer = Double.NaN
      var found = false
      s.sampled.foreach { st =>
        if (!found) {
          minRank += st.g
          if (minRank + st.delta - eps <= rank && rank <= minRank + eps) {
            answer = st.value; found = true
          }
        }
      }
      if (!found) answer = s.sampled.last.value
      val sorted = values.sorted
      val lt = sorted.count(_ < answer).toLong
      val le = sorted.count(_ <= answer).toLong
      assert(rank - eps <= le && lt + 1 <= rank + eps,
        s"q=$q: replay $answer has rank bracket [${lt + 1}, $le], want $rank +- $eps")
    }
  }

  test("topk export is deterministically ordered; roundtrip is semantic identity") {
    val s = new TopKSketch(16)
    Seq("b" -> 5, "a" -> 5, "c" -> 9, "d" -> 1).foreach { case (it, n) =>
      (0 until n).foreach(_ => s.add(it))
    }
    val row = spark.range(1).select(
        GraftFunctions.topk_export(lit(s.serialize())).as("w"),
        (GraftFunctions.topk_export(GraftFunctions.topk_import(
          GraftFunctions.topk_export(lit(s.serialize()))))
          === GraftFunctions.topk_export(lit(s.serialize()))).as("rt"))
      .collect().head
    val entries = row.getStruct(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(entries == Seq(("c", 9L), ("a", 5L), ("b", 5L), ("d", 1L)))
    assert(row.getBoolean(1))
  }

  test("concatenated topk exports import to the exact merge when under capacity") {
    val a = new TopKSketch(32)
    val b = new TopKSketch(32)
    (0 until 400).foreach(i => a.add(s"k${i % 7}"))
    (0 until 300).foreach(i => b.add(s"k${i % 11}"))
    import spark.implicits._
    val entries = Seq(a, b).flatMap(_.topK(Int.MaxValue))
    val merged = { val m = TopKSketch.deserialize(a.serialize()); m.merge(b); m }
    val back = Seq((32, entries)).toDF("capacity", "entries")
      .select(GraftFunctions.topk_export(GraftFunctions.topk_import(
        struct(col("capacity"),
          col("entries").cast("array<struct<item:string,n:bigint>>")))).as("w"))
      .collect().head.getStruct(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(back == merged.topK(Int.MaxValue).toSeq)
  }

  test("topk sketch agg is partition-order independent at exact capacity") {
    import spark.implicits._
    val df = (0 until 5000).map(i => s"t${i % 13}").toDF("v")
    val res = for (parts <- Seq(1, 8)) yield
      df.repartition(parts)
        .agg(GraftFunctions.topk_export(
          GraftFunctions.topk_sketch_agg(col("v"), 64)).as("w"))
        .collect().head.getStruct(0).getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getLong(1)))
    assert(res(0) == res(1))
    assert(res(0).toMap.values.sum == 5000L) // exact regime: counts are exact
  }
}
