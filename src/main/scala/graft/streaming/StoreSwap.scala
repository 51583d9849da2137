package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe parquet store generation swap shared by the streaming
  * maintenance sinks ([[StreamingScd2]], [[StreamingRollup]]): write the
  * new generation to `_tmp` FIRST (it is what reads the current store),
  * rename the store aside to `_old`, rename `_tmp` in, drop `_old`. A
  * crash between the two renames leaves `_old` on disk; [[recover]] (run
  * before every read) renames the surviving generation back, so there is
  * no window where the table can silently vanish, and every rename result
  * is checked. At warehouse scale a table format or partition-level swap
  * replaces this dance.
  */
private[streaming] object StoreSwap {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Crash recovery: store present + stale `_old` -> drop the old
    * generation; store missing but `_old` present -> the previous swap
    * died between its renames, restore the surviving generation.
    */
  def recover(spark: SparkSession, storePath: String): Unit = {
    val (f, storeP) = fs(spark, storePath)
    val oldP = new org.apache.hadoop.fs.Path(storePath + "_old")
    if (f.exists(storeP) && f.exists(oldP)) f.delete(oldP, true)
    else if (!f.exists(storeP) && f.exists(oldP)) {
      require(f.rename(oldP, storeP), s"store recovery rename failed: $oldP")
    }
    ()
  }

  def exists(spark: SparkSession, storePath: String): Boolean = {
    val (f, storeP) = fs(spark, storePath)
    f.exists(storeP)
  }

  /** Materialize `newStore` and swap it in as the current generation. */
  def swapIn(newStore: DataFrame, storePath: String): Unit = {
    val spark = newStore.sparkSession
    val (f, storeP) = fs(spark, storePath)
    val oldP = new org.apache.hadoop.fs.Path(storePath + "_old")
    val tmp = new org.apache.hadoop.fs.Path(storePath + "_tmp")
    newStore.write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(storeP)) {
      require(f.rename(storeP, oldP), s"store swap-aside failed: $storeP")
    }
    require(f.rename(tmp, storeP), s"store swap-in failed: $tmp")
    if (f.exists(oldP)) f.delete(oldP, true)
    ()
  }
}
