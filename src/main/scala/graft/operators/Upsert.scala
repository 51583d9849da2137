package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics over plain tables: apply a delta batch to a
  * snapshot with last-writer-wins per key — the incremental-ingest primitive
  * (Delta/Iceberg `MERGE INTO` shape) for pipelines that re-crawl or
  * re-score documents and must fold updates into the corpus without
  * rewriting history.
  *
  * Plan shape: union (no shuffle) then ONE hash exchange on the key columns
  * for the per-key window — the minimum any keyed merge can do. No
  * broadcast of the snapshot, no join: at 100 TB the snapshot side streams
  * through the shuffle once. With both inputs bucketed on the key
  * ([[Layout.bucketedWrite]]) even that exchange disappears.
  */
object Upsert {

  /** Last-writer-wins merge: rows from `delta` replace snapshot rows with
    * equal `keyCols`; within a side, the highest `versionCol` wins; on a
    * version tie the delta row wins. Schemas must match.
    */
  def upsert(
      snapshot: DataFrame, delta: DataFrame,
      keyCols: Seq[String], versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    require(snapshot.columns.sameElements(delta.columns),
      "snapshot/delta schemas must match")
    require(!snapshot.columns.exists(c => c == "_src" || c == "_rn"),
      "upsert reserves column names _src and _rn")
    val unioned = snapshot.withColumn("_src", lit(0))
      .unionByName(delta.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    unioned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** SCD2 (slowly-changing-dimension type 2) history build: collapse a
    * versioned key history — a stack of snapshots or a CDC feed, one row
    * per (key, version) observation — into validity intervals. Output keeps
    * only CHANGE POINTS: `valid_from` = the version that introduced the
    * value, `valid_to` = the version of the next change (null while
    * current), `is_current`. Value drift is detected on `cmpCols` via the
    * same null-flagged composite hash as [[snapshotDiff]], so wide rows
    * compare as one long.
    *
    * Plan shape: ONE exchange on the key; the change-detection `lag` and
    * the interval-closing `lead` share partitioning and ordering (the
    * filter between them preserves sort), so Catalyst plans a single
    * sort — at 100 TB the history streams through the shuffle once.
    */
  def scd2(
      history: DataFrame, keyCols: Seq[String], cmpCols: Seq[String],
      versionCol: String): DataFrame = {
    require(keyCols.nonEmpty && cmpCols.nonEmpty)
    val reserved = Seq("_sig", "_chg", "valid_from", "valid_to", "is_current")
    require(!(keyCols ++ cmpCols :+ versionCol).exists(reserved.contains),
      s"scd2 reserves column names ${reserved.mkString(", ")}")
    val sig = xxhash64(cmpCols.flatMap(c => Seq(col(c).isNull, col(c))): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    history.withColumn("_sig", sig)
      .withColumn("_chg",
        coalesce(col("_sig") =!= lag(col("_sig"), 1).over(w), lit(true)))
      .filter(col("_chg"))
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_sig", "_chg", versionCol)
  }

  /** Snapshot reconciliation: classify every key as added / removed /
    * changed / unchanged between two table versions — the audit that
    * validates an ingest before it ships. Same single-exchange shape as
    * [[upsert]] (union + one keyed aggregation; a full-outer join would
    * shuffle both sides too, but then carry every column through the join).
    * `cmpCols` are the value columns whose drift counts as "changed",
    * compared via a composite hash so wide rows cost one long per side.
    */
  def snapshotDiff(
      before: DataFrame, after: DataFrame,
      keyCols: Seq[String], cmpCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && cmpCols.nonEmpty)
    require(!(keyCols ++ cmpCols).exists(c => c == "_sig" || c == "_t"),
      "snapshotDiff reserves column names _sig and _t")
    // hash each column's null FLAG alongside its value: Spark's xxhash64
    // skips null children entirely, so (x, null) and (null, x) would
    // otherwise fold the same value sequence and misreport 'unchanged'
    val sig = xxhash64(
      (keyCols.map(col) ++ cmpCols.flatMap(c => Seq(col(c).isNull, col(c)))): _*)
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select((keyCols.map(col) :+ sig.as("_sig") :+ lit(tag).as("_t")): _*)
    side(before, 0).unionByName(side(after, 1))
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(when(col("_t") === 0, col("_sig"))).as("_s0"),
        max(when(col("_t") === 1, col("_sig"))).as("_s1"))
      .select(
        when(col("_s0").isNull, "added")
          .when(col("_s1").isNull, "removed")
          .when(col("_s0") === col("_s1"), "unchanged")
          .otherwise("changed").as("change"))
      .groupBy(col("change")).agg(count(lit(1)).as("n_keys"))
  }

  /** Per-key snapshot DELTA: the `after` rows whose key is new or whose
    * compared columns drifted since `before`, tagged 'added' / 'changed' —
    * the exact input set an incremental pipeline must re-process. Feeding
    * downstream work (re-shingle, re-index, re-dedup) from this instead of
    * the full snapshot makes its cost proportional to |delta|, not
    * |corpus| — at 100 TB with a ~1% daily churn that is the difference
    * between a nightly job and an impossible one. Comparison hashes the
    * null flag alongside each value (see [[snapshotDiff]]); the join
    * carries one long per before-row, never before's payload columns.
    */
  def snapshotDelta(
      before: DataFrame, after: DataFrame,
      keyCols: Seq[String], cmpCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && cmpCols.nonEmpty)
    require(!(keyCols ++ cmpCols).exists(c => c == "_bsig" || c == "_asig" || c == "change"),
      "snapshotDelta reserves column names _bsig, _asig, change")
    val sig = xxhash64(cmpCols.flatMap(c => Seq(col(c).isNull, col(c))): _*)
    val b = before.select((keyCols.map(col) :+ sig.as("_bsig")): _*)
    after.withColumn("_asig", sig)
      .join(b, keyCols, "left")
      .filter(col("_bsig").isNull || col("_bsig") =!= col("_asig"))
      .withColumn("change",
        when(col("_bsig").isNull, "added").otherwise("changed"))
      .drop("_bsig", "_asig")
  }

  /** Build a re-aggregatable rollup at `keyCols` grain: per-key SUMs plus
    * a row count. The measures are chosen to RE-AGGREGATE (sum of sums =
    * sum of the union; avg derives as sum/count downstream), which is what
    * makes [[incrementalRollup]] possible.
    */
  def rollup(
      raw: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      countCol: String = "n_rows"): DataFrame = {
    require(keyCols.nonEmpty && sumCols.nonEmpty)
    raw.groupBy(keyCols.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        (sumCols.tail.map(c => sum(c).as(c)) :+ count(lit(1)).as(countCol)): _*)
  }

  /** Incremental rollup maintenance: fold a raw delta batch into a stored
    * [[rollup]] without rescanning history. The delta is partially
    * aggregated to the rollup grain (map-side combine collapses it before
    * the shuffle), unioned with the stored table, and re-summed — cost
    * proportional to |delta| + |stored rollup|, NOT the raw history. At
    * 100 TB this is the difference between a nightly rollup rebuild
    * reading the full fact table and one reading yesterday's kilobyte-per-
    * key summary plus the day's partition. Equivalence to a full rebuild
    * is exact for sum/count measures (associative + commutative).
    */
  def incrementalRollup(
      stored: DataFrame, rawDelta: DataFrame,
      keyCols: Seq[String], sumCols: Seq[String],
      countCol: String = "n_rows"): DataFrame = {
    require(stored.columns.toSet == (keyCols ++ sumCols :+ countCol).toSet,
      s"stored rollup columns ${stored.columns.mkString(",")} must be keys+sums+$countCol")
    val deltaAgg = rollup(rawDelta, keyCols, sumCols, countCol)
    stored.unionByName(deltaAgg)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sumCols.head).as(sumCols.head),
        (sumCols.tail.map(c => sum(c).as(c)) :+ sum(col(countCol)).as(countCol)): _*)
  }
}
