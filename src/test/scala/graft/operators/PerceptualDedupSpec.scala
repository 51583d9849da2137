package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The media-dedup seam: grid PNGs decode to EXACTLY their constructed
  * ahash bits, flipped cells move the hash by exactly that many bits, and
  * perceptualDedup's pigeonhole blocking finds the planted near-dups
  * without all-pairs work.
  */
class PerceptualDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gridPng decodes to its constructed hash; flips move exactly those bits") {
    val dec = new Multimodal.ImageIoDecoder
    for (seed <- 0L until 40L) {
      val f = dec.decodeImage(Multimodal.gridPng(seed))
      assert(f.width == 32 && f.height == 32)
      assert(f.ahash == Multimodal.gridPngExpectedHash(seed),
        s"seed $seed: decoded hash != constructed hash")
      val flipped = dec.decodeImage(Multimodal.gridPng(seed, flipCells = Seq(5, 18))).ahash
      assert(java.lang.Long.bitCount(f.ahash ^ flipped) == 2,
        s"seed $seed: flip distance != 2")
    }
  }

  test("perceptualDedup clusters planted near-dups, keeps min id, leaves the rest") {
    import spark.implicits._
    val dec = new Multimodal.ImageIoDecoder
    // 60 originals; ids divisible by 4 get a hamming-2 clone at id+1000
    val rows = (0L until 60L).flatMap { id =>
      val h = dec.decodeImage(Multimodal.gridPng(id)).ahash
      val base = Seq((id, h))
      if (id % 4 == 0)
        base :+ ((id + 1000L,
          dec.decodeImage(Multimodal.gridPng(id, flipCells = Seq(7, 40))).ahash))
      else base
    }
    val df = rows.toDF("media_id", "ahash")
    val out = Dedup.perceptualDedup(df, "ahash", "media_id", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == rows.size)
    for (id <- 0L until 60L) {
      assert(out(id) == ((id, true)), s"original $id must represent itself")
      if (id % 4 == 0)
        assert(out(id + 1000L) == ((id, false)), s"clone of $id must cluster and drop")
    }
    // hamming ABOVE the threshold does not cluster even though blocking
    // finds the candidate (3 of 4 chunks still equal)
    val far = Seq((1L, 0x0f0f0f0f0f0f0f0fL), (2L, 0x0f0f0f0f0f0f0fF0L)) // hamming 8
      .toDF("media_id", "ahash")
    val farOut = Dedup.perceptualDedup(far, "ahash", "media_id", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(farOut == Map(1L -> true, 2L -> true))
  }
}
