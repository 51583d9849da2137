package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LineDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("corpus-wide boilerplate lines removed, order preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "COOKIE BANNER\nalpha bravo\ncharlie delta\nCOOKIE BANNER"),
      (2L, "cookie banner\nunique to two"),
      (3L, "only original text here\nsecond line three"),
      (4L, "COOKIE BANNER\n\n  \n"), // all-boilerplate doc: survives, empty
      (5L, "")                       // no non-blank lines: drops out
    ).toDF("doc_id", "text")

    val out = Dedup.lineDedup(docs, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

    // normalize=true: "COOKIE BANNER" and "cookie banner" count as one line
    // in 3 distinct docs -> dropped everywhere; everything else unique.
    assert(out(1L) == (("alpha bravo\ncharlie delta", 4L, 2L)))
    assert(out(2L) == (("unique to two", 2L, 1L)))
    assert(out(3L) == (("only original text here\nsecond line three", 2L, 0L)))
    assert(out(4L) == (("", 1L, 1L)))
    assert(!out.contains(5L))
  }

  test("normalize=false keeps case-variant lines distinct") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Shared Line\nown one"),
      (2L, "shared line\nown two")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text",
        minDocFreq = 2, normalize = false)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("minDocFreq threshold: within-doc repeats alone do not trigger") {
    import spark.implicits._
    val docs = Seq(
      (1L, "echo\necho\necho"), // repeated in ONE doc only -> df=1, kept
      (2L, "other stuff")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out(1L) == (("echo\necho\necho", 0L)))
  }
}
