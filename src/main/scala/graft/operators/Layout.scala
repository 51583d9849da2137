package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout tools: Z-order (Morton-curve) clustering so
  * a table queried by MORE THAN ONE column prunes files on all of them.
  *
  * A single-column sort gives perfect file-level min/max pruning on that
  * column and none on any other. Interleaving the bits of several columns'
  * bucket ranks orders rows along a space-filling curve, so each written
  * file covers a small hyper-rectangle of the key space — min/max footer
  * stats then prune on EVERY interleaved column (the layout behind
  * Delta/Iceberg `OPTIMIZE ZORDER`). This is a write-path layout job: paid
  * once at ingest/compaction, saved on every subsequent scan.
  *
  * Scale shape: one tiny min/max aggregate per column (single partial/final
  * agg, broadcast into the plan as literals), then a map-only bucket+
  * interleave expression and one range shuffle on the z-key —
  * `repartitionByRange` samples the key distribution, so output files are
  * even-sized regardless of data skew.
  */
object Layout {

  /** Z-order key from numeric columns: each value is scaled into a
    * `bits`-wide bucket rank via its column's [min, max] (computed in one
    * aggregate pass), then ranks are bit-interleaved into one long.
    * Supports 2-4 columns at up to 16 bits each.
    */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.length >= 2 && cols.length <= 4, "zorder needs 2-4 columns")
    require(bits >= 1 && cols.length * bits <= 63, s"${cols.length} cols x $bits bits > 63")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"_min_$c"), max(col(c)).cast("double").as(s"_max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.foreach { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"zorder column '$c' has no non-null values (empty input or all-null column)")
    }
    val maxRank = (1L << bits) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val lo = row.getDouble(2 * i)
      val hi = row.getDouble(2 * i + 1)
      if (hi == lo) lit(0L)
      else least(lit(maxRank), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(maxRank + 1)).cast("long")))
    }
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.InterleaveBits(
        ranks.map(org.apache.spark.sql.graftshim.GraftShims.expression), bits))
  }

  /** Write `df` as a catalog-managed parquet table hash-bucketed (and
    * optionally bucket-sorted) on `bucketCols` — Spark's persisted
    * partitioning. A join or aggregation keyed on the bucket columns between
    * tables with the SAME bucket count reads co-located data and plans with
    * NO shuffle exchange (and no sort when `sortCols` covers the key): at
    * 100 TB this turns a recurring fact-to-fact join from a full-network
    * shuffle, paid on every run, into a local merge paid once at write time.
    * Equality filters on the bucket column additionally prune the scan to a
    * single bucket's files.
    */
  def bucketedWrite(
      df: DataFrame, table: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketedWrite needs at least one bucket column")
    val spark = df.sparkSession
    // A managed table's warehouse directory can outlive the (in-memory)
    // catalog entry across JVMs; saveAsTable refuses to reuse the orphaned
    // location, so clear it when no catalog entry claims it.
    if (!spark.catalog.tableExists(table)) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Globally-ordered parquet export: range-repartition on the sort key
    * (sampled split points → evenly-sized files), sort within each, write.
    * File i's key range wholly precedes file i+1's, so concatenating files
    * in partition order IS the total order — no single-reducer global
    * sort — and the parquet min/max footers prune range predicates to the
    * one file that can match.
    */
  def sortedExport(
      df: DataFrame, sortCols: Seq[String], path: String,
      numFiles: Int): Unit = {
    require(sortCols.nonEmpty, "sortedExport needs at least one sort column")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files compaction: rewrite a parquet dataset into
    * `ceil(totalBytes / targetFileBytes)` evenly-sized files. The 100 TB
    * ops reality behind it: streaming ingest and fine-grained partitioned
    * writes accumulate kilobyte files whose per-file open/footer cost
    * dominates scans and whose listing slows planning; periodic compaction
    * restores scan-sized files. Sizing comes from the filesystem listing
    * (no data pass), the rewrite is one round-robin repartition, and the
    * destination is separate so the swap can be atomic at the catalog/path
    * level (never compact in place).
    */
  def compactTo(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String, destPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(hconf)
    val totalBytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
    spark.read.parquet(srcPath)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(destPath)
    nFiles
  }

  /** Hive-style partitioned parquet layout: one directory per partition
    * value. At 100 TB the partition column is the COARSE pruning axis
    * (ingest date, source, status): a reader with a partition predicate
    * never lists or opens non-matching directories — pruning happens at
    * planning time (`PartitionFilters` in the scan), before any file I/O.
    * Keep partition cardinality modest (directories, not rows, are the
    * cost); high-cardinality pruning belongs to bucketing/z-order below.
    */
  def partitionedWrite(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit = {
    require(partitionCols.nonEmpty, "partitionedWrite needs at least one partition column")
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
  }

  /** Parquet write with COLUMN BLOOM FILTERS on `bloomCols` — the
    * point-lookup pruning lever for high-cardinality keys that partition
    * dirs (coarse) and min/max stats (useless on hash-like keys: every
    * row group spans the full value range) cannot prune. With a bloom
    * per row group, an equality predicate skips row groups whose filter
    * excludes the value — at 100 TB that turns "scan the url column of
    * everything" into "open footers, read the handful of row groups that
    * might hold it". Size `expectedNdv` to the PER-ROW-GROUP distinct
    * count (the writer builds one filter per row group), not the global
    * one, or the filters come out larger than needed.
    */
  def bloomFilteredWrite(
      df: DataFrame, path: String, bloomCols: Seq[String],
      expectedNdv: Long = 1000000L): Unit = {
    require(bloomCols.nonEmpty, "bloomFilteredWrite needs at least one bloom column")
    require(expectedNdv > 0, "expectedNdv must be positive")
    bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)
  }

  /** Write `df` as parquet clustered on the Z-order of `cols`: range
    * repartition on the z-key into `numFiles` even output files, sort within
    * each, drop the key. Every listed column then prunes at file level.
    */
  def zorderWrite(
      df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val key = zorderKey(df, cols, bits)
    df.withColumn("_zkey", key)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
