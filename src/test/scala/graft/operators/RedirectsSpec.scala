package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RedirectsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pages(rows: (String, Boolean, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("url", "redir", "loc")
  }

  private def resolveMap(df: org.apache.spark.sql.DataFrame, maxHops: Int = 8) =
    Redirects.resolve(df, "url", "redir", "loc", maxHops)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap

  test("all four outcomes: final, multi-hop resolved, dangling, loop") {
    val got = resolveMap(pages(
      ("a", true, "b"), // a -> b -> c -> z: 3 hops
      ("b", true, "c"),
      ("c", true, "z"),
      ("z", false, null),
      ("d", true, "nowhere"), // leaves the crawl
      ("e", true, "f"), // 2-cycle
      ("f", true, "e"),
      ("g", true, "g"), // self-cycle
      ("h", true, "z"))) // 1 hop straight to final
    assert(got("z") == (("final", Some("z"), Some(0L))))
    assert(got("a") == (("resolved", Some("z"), Some(3L))))
    assert(got("b") == (("resolved", Some("z"), Some(2L))))
    assert(got("c") == (("resolved", Some("z"), Some(1L))))
    assert(got("h") == (("resolved", Some("z"), Some(1L))))
    assert(got("d") == (("dangling", Some("nowhere"), Some(1L))))
    assert(got("e") == (("loop", None, None)))
    assert(got("f") == (("loop", None, None)))
    assert(got("g") == (("loop", None, None)))
    assert(got.size == 9) // one row per input page, nothing dropped
  }

  test("maxHops bounds chains: a legal chain longer than the cap reads as loop") {
    val chain = (0 until 6).map(i => (s"u$i", true, s"u${i + 1}")) :+ (("u6", false, null: String))
    val strict = resolveMap(pages(chain: _*), maxHops = 3)
    assert(strict("u0") == (("loop", None, None))) // 6 hops > 3
    assert(strict("u3") == (("resolved", Some("u6"), Some(3L)))) // exactly at the cap
    val loose = resolveMap(pages(chain: _*), maxHops = 8)
    assert(loose("u0") == (("resolved", Some("u6"), Some(6L))))
  }

  test("early exit: a corpus whose chains all resolve in <= 2 hops pays 2 join rounds") {
    // every chain terminates within 2 hops; maxHops 8 must NOT cost 8 rounds
    val df = pages(
      ("a", true, "b"), ("b", true, "z"), // 2-hop chain
      ("h", true, "z"), // 1-hop chain
      ("z", false, null), ("w", false, null))
    val (result, rounds) = Redirects.resolveWithStats(df, "url", "redir", "loc", maxHops = 8)
    assert(rounds <= 3, s"expected early exit, ran $rounds join rounds")
    val got = result.collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got("a") == (("resolved", Some("z"), Some(2L))))
    assert(got("b") == (("resolved", Some("z"), Some(1L))))
    assert(got("h") == (("resolved", Some("z"), Some(1L))))
    assert(got("z") == (("final", Some("z"), Some(0L))))
    assert(got("w") == (("final", Some("w"), Some(0L))))
    assert(got.size == 5)
    // and a cycle still costs the full cap (no premature drain)
    val (_, fullRounds) = Redirects.resolveWithStats(
      pages(("e", true, "f"), ("f", true, "e"), ("z", false, null)),
      "url", "redir", "loc", maxHops = 8)
    assert(fullRounds == 8)
  }

  test("redirect statuses: 3xx-with-Location set, 304 and 2xx excluded") {
    import spark.implicits._
    val got = Seq(200, 301, 302, 303, 304, 307, 308, 404)
      .toDF("s").select(col("s"), Redirects.isRedirectStatus(col("s")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(got.filter(_._2).keySet == Set(301, 302, 303, 307, 308))
  }
}
