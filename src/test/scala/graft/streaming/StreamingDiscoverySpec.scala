package graft.streaming

import graft.operators.Feeds
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingDiscoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rss(host: String, urls: Seq[String]): Array[Byte] =
    Feeds.writeRss(s"$host feed",
      urls.map(u => (u, s"t $u", "Mon, 01 Jan 2026 00:00:00 GMT", u)))

  test("re-polled feeds emit each unknown url exactly once; known urls never") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val frontier = Seq("http://a/known1", "http://a/known2", "http://b/known3")
      .toDF("url")
    // poll 1: host a announces known1 + new1; host b announces known3
    // poll 2 (re-poll, overlapping): a announces known1 + new1 + new2
    // poll 3: b announces new3; a re-announces new2 (still in horizon)
    val polls = Seq(
      (new Timestamp(base), "a", rss("a", Seq("http://a/known1", "http://a/new1"))),
      (new Timestamp(base + 1000), "b", rss("b", Seq("http://b/known3"))),
      (new Timestamp(base + 60000), "a",
        rss("a", Seq("http://a/known1", "http://a/new1", "http://a/new2"))),
      (new Timestamp(base + 120000), "b", rss("b", Seq("http://b/new3"))),
      (new Timestamp(base + 120000), "a", rss("a", Seq("http://a/new2"))))

    val stream = MemoryStream[(Timestamp, String, Array[Byte])]
    val out = StreamingDiscovery.newUrls(stream.toDS(), frontier,
      watermarkDelay = "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("discovery_out").start()
    try {
      // one poll per micro-batch: the dedup must hold across batches
      polls.foreach { p => stream.addData(p); q.processAllAvailable() }
      val got = spark.table("discovery_out")
        .select("url", "host", "kind").as[(String, String, String)]
        .collect().sortBy(_._1)
      assert(got.map(_._1).toSeq ==
        Seq("http://a/new1", "http://a/new2", "http://b/new3"))
      assert(got.forall(_._3 == "rss"))
      // batch equivalence: same inputs through the batch path
      val batch = polls.flatMap { case (_, h, bytes) =>
        Feeds.parse(bytes).map(e => (e.link, h))
      }.distinct
        .filterNot { case (u, _) =>
          Seq("http://a/known1", "http://a/known2", "http://b/known3").contains(u)
        }.map(_._1).sorted
      assert(batch == got.map(_._1).toSeq)
    } finally q.stop()
  }

  test("atom feeds stream through the same walk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val frontier = Seq.empty[String].toDF("url")
    val atom = Feeds.writeAtom("f",
      Seq(("http://x/p1", "t", "2026-01-01T00:00:00Z", "id1")))
    val stream = MemoryStream[(Timestamp, String, Array[Byte])]
    val out = StreamingDiscovery.newUrls(stream.toDS(), frontier)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("discovery_atom_out").start()
    try {
      stream.addData((new Timestamp(1700000000000L), "x", atom))
      q.processAllAvailable()
      val got = spark.table("discovery_atom_out")
        .select("url", "kind", "published").collect()
      assert(got.length == 1)
      assert(got(0).getString(0) == "http://x/p1" && got(0).getString(1) == "atom")
      assert(got(0).getString(2) == "2026-01-01T00:00:00Z")
    } finally q.stop()
  }
}
