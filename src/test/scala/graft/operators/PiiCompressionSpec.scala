package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiCompressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("PII redaction replaces emails/phones/SSNs/IPs with placeholders") {
    import spark.implicits._
    val df = Seq(
      "contact me at jane.doe+test@example.co.uk or 555-867-5309 x2",
      "server at 192.168.1.254 handled ssn 123-45-6789 yesterday",
      "no pii here at all"
    ).toDF("t")
    val got = df.select(TextAnalysis.redactPii(col("t")).as("r"),
      TextAnalysis.piiCount(col("t")).as("n")).collect()
    assert(got(0).getString(0).contains("<EMAIL>"))
    assert(got(0).getString(0).contains("<PHONE>") || got(0).getString(0).contains("555"))
    assert(!got(0).getString(0).contains("example.co.uk"))
    assert(got(1).getString(0).contains("<IP>") && got(1).getString(0).contains("<SSN>"))
    assert(!got(1).getString(0).contains("123-45-6789"))
    assert(got(2).getString(0) == "no pii here at all" && got(2).getInt(1) == 0)
  }

  test("compression ratio separates boilerplate from noise") {
    import spark.implicits._
    val boiler = "click here to subscribe " * 50
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(1000)((rnd.nextInt(94) + 33).toChar).mkString
    // realistic length: short strings don't compress (header overhead), so
    // use a paragraph-scale natural text
    val normal = Seq("The quick brown fox jumps over the lazy dog near the river bank.",
      "A distributed query engine partitions its input and aggregates partial results.",
      "Sketches summarize large multisets in constant space with bounded error.",
      "Watermarks bound how late an event may arrive before its window closes.")
      .mkString(" ") * 4
    val df = Seq(boiler, noise, normal, "").toDF("t")
    val r = df.select(TextAnalysis.compressionRatio(col("t"))).collect().map(_.getDouble(0))
    assert(r(0) < 0.1, s"boilerplate should compress hard: ${r(0)}")
    assert(r(1) > 0.8, s"noise should not compress: ${r(1)}")
    assert(r(2) > r(0) && r(2) < r(1))
    assert(r(3) == 1.0) // empty edge
    // determinism
    val r2 = df.select(TextAnalysis.compressionRatio(col("t"))).collect().map(_.getDouble(0))
    assert(r.toSeq == r2.toSeq)
  }
}
