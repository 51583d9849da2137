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

  /** EXACT anti-join with a Bloom prune — the 100 TB shape of "keep only
    * URLs the crawl has never seen" when the answer must be exact, not
    * [[filterUnseen]]'s approximation:
    *
    *  1. Bloom-NEGATIVE rows are definitely new — they pass map-only,
    *     never shuffling (at a frontier-growth ratio of mostly-new URLs
    *     this is the bulk of the stream).
    *  2. Bloom-POSITIVE rows (true duplicates + the fpp sliver of false
    *     positives) go through the exact `left_anti` join — only this
    *     fraction pays the shuffle.
    *
    * Result == `big.join(reference, key, "left_anti")` row-for-row; the
    * Bloom only routes. The `big` lineage is read twice (once per branch),
    * but both reads are key-column-pruned map scans — at 100 TB two pruned
    * scans beat shuffling the full stream, and a persisted/checkpointed
    * `big` collapses them to one. (Spark's own `InjectRuntimeFilter` does
    * this for selective inner equi-joins; anti-joins against a giant
    * seen-set need it spelled out.)
    *
    * CONTRACT: `big` must be DETERMINISTIC under re-evaluation — the two
    * branches partition the stream only if both reads see the same rows.
    * A nondeterministic lineage (`rand()`-derived keys, a non-idempotent
    * source, a changing view) can land a row in both branches (duplicated)
    * or neither (dropped). Persist/`localCheckpoint` such an input before
    * calling, exactly as you would before any Spark self-join on it.
    */
  def prunedAntiJoin(
      big: DataFrame, bigCol: String,
      reference: DataFrame, refCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val filter = buildFilter(reference.select(col(refCol).cast("string").as(refCol)),
      refCol, expectedItems, fpp)
    val definitelyNew = big.filter(!mightContain(col(bigCol), filter))
    val maybeSeen = big.filter(mightContain(col(bigCol), filter))
    val confirmedNew = maybeSeen.join(
      reference.select(col(refCol).as(bigCol)), Seq(bigCol), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }
}
