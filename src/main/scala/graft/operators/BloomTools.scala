package graft.operators

import graft.functions.BloomMightContain
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership for pipeline "seen-set" problems (URL dedup
  * against a historical corpus, incremental ingestion skip-lists).
  *
  * Scale pattern: build the filter from the (smaller) reference side with
  * Spark's public `stat.bloomFilter` (distributed build, driver merge),
  * then ship it inside the plan and filter the 100 TB side map-only — no
  * shuffle, no join. False positives only (tunable via fpp): a "maybe seen"
  * can be re-checked with an exact anti-join on the survivors when needed.
  */
object BloomTools {

  def buildFilter(df: DataFrame, colName: String, expectedItems: Long, fpp: Double): BloomFilter =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  def mightContain(c: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftShims.column(BloomMightContain(
      GraftShims.expression(c.cast("string")), bos.toByteArray))
  }

  /** Approximate anti-join: rows of `big` whose key is definitely NOT in
    * `reference` (Bloom false positives drop a small fraction of genuinely
    * new rows; never lets a seen row through).
    */
  def filterUnseen(
      big: DataFrame, bigCol: String,
      reference: DataFrame, refCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val filter = buildFilter(reference.select(col(refCol).cast("string").as(refCol)),
      refCol, expectedItems, fpp)
    big.filter(!mightContain(col(bigCol), filter))
  }
}
