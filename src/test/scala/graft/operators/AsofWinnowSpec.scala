package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsofWinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "B", ts("2024-01-01 10:02:00")),
      (4L, "C", ts("2024-01-01 10:00:00")) // key with no quotes
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0), // equal time: <= includes it
      ("A", ts("2024-01-01 10:06:00"), 102.0), // future: never visible
      ("B", ts("2024-01-01 10:00:00"), 50.0)
    ).toDF("sym", "qt", "price")

    val out = AsofJoin.asofJoin(trades, quotes,
        Seq("sym"), Seq("sym"), "t", "qt", Seq("price"))
      .select(col("trade_id"), col("asof_price"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    assert(out(1L) == 100.0)  // 09:59 quote
    assert(out(2L) == 101.0)  // equal-time quote visible under <=
    assert(out(3L) == 50.0)
    assert(out(4L) == null)   // no quotes for C -> null carried
  }

  test("asof join strict: equal-time right row excluded") {
    import spark.implicits._
    val l = Seq((1L, "A", ts("2024-01-01 10:05:00"))).toDF("id", "k", "t")
    val r = Seq(
      ("A", ts("2024-01-01 10:05:00"), 1.0),
      ("A", ts("2024-01-01 10:00:00"), 2.0)).toDF("k", "qt", "v")
    val strict = AsofJoin.asofJoin(l, r, Seq("k"), Seq("k"), "t", "qt", Seq("v"), strict = true)
      .collect()(0).getAs[Double]("asof_v")
    assert(strict == 2.0) // 10:05 quote excluded under <
  }

  test("winnowing: shared long substring produces shared fingerprints; disjoint texts do not") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = Seq(
      (1L, shared + " alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa " + shared),
      (3L, "completely unrelated words about query engines and columnar storage formats")
    ).toDF("id", "text")
    val fp = df.select(col("id"),
      TextAnalysis.winnowingFingerprint(col("text")).as("fp"))
    val a = fp.select(col("id").as("id1"), col("fp").as("fp1"))
    val b = fp.select(col("id").as("id2"), col("fp").as("fp2"))
    val overlaps = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        Dedup.sortedJaccard(col("fp1"), col("fp2")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(overlaps((1L, 2L)) > 0.4, s"shared substring overlap too low: ${overlaps((1L, 2L))}")
    assert(overlaps((1L, 3L)) == 0.0 && overlaps((2L, 3L)) == 0.0)
  }

  test("winnowing determinism and edge cases") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "ab"), (3L, "identical words here"), (4L, "identical words here"))
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.winnowingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).isEmpty)  // empty text
    assert(got(2L).isEmpty)  // shorter than kGram
    assert(got(3L) == got(4L) && got(3L).nonEmpty)
  }

  test("winnowing normalization matches the regex formulation") {
    // the expression normalizes in a single pass; this is the spec it must
    // match (lowercase, collapse non-letter runs to one space, trim)
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(Seq((9001L, "  --Leading!! and TRAILING??  "),
        (9002L, "mixed2案例 CASE with «odd» sïgns\t\nnewlines"),
        (9003L, "a;b.c,d e")).toDF("doc_id", "text"))
    val viaExpr = docs.select(col("doc_id"),
        TextAnalysis.winnowingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // re-derive through the documented regex normalization + the same
    // rolling-hash/winnow params by pre-normalizing in the driver
    val preNormed = docs.collect().map { r =>
      val norm = r.getString(1).toLowerCase.replaceAll("[^\\p{L}]+", " ").trim
      (r.getLong(0), norm)
    }.toSeq.toDF("doc_id", "text")
    val viaRegex = preNormed.select(col("doc_id"),
        TextAnalysis.winnowingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.keySet == viaRegex.keySet)
    viaExpr.foreach { case (id, fp) =>
      assert(fp == viaRegex(id), s"normalization divergence for doc $id") }
  }
}
