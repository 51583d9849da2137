package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 stress numbers (recorded in BASELINE.md): anchor/boilerplate
  * extraction, Bloom-pruned anti-join, and budget apportionment at corpus
  * scale. Run: `sbt 'Test/runMain graftdrive.StressDriveR9'` on a quiet
  * host.
  */
object StressDriveR9 {

  /** ~2.5 KiB page: the boilerplate demo blocks plus a watPage link farm —
    * realistic tag/text/anchor density for the extractor hot loop.
    */
  private def page(id: Long): (Long, String, String) = {
    val (url, linkFarm) = graft.operators.Ingest.watPage(id)
    val body = graft.operators.Ingest.boilerplatePage(id)
      .replace("<html><body>",
        s"<html><head><title>Doc $id stress</title></head><body>")
    (id, url, body.replace("</body></html>", "") + linkFarm + "</body></html>")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val ta = graft.operators.TextAnalysis

    // 1) anchor + block extraction, 500k cached pages (~1.2 GiB HTML):
    //    both expressions in one map-only projection, counts materialized
    val nPages = 500000L
    val pages = spark.range(nPages).repartition(64)
      .map((r: java.lang.Long) => StressDriveR9.page(r.longValue))
      .toDF("doc_id", "url", "html").cache()
    val htmlBytes = pages.select(sum(length(col("html")))).as[Long].head()
    pages.select(size(ta.htmlAnchors(col("html"), col("url")))).agg(sum("*")).head() // warm
    val t0 = System.nanoTime()
    val (nAnchors, nBlocks, nTitles) = pages.select(
        size(ta.htmlAnchors(col("html"), col("url"))).as("a"),
        size(ta.htmlBlocks(col("html"))).as("b"),
        when(ta.htmlMeta(col("html"), col("url")).getField("title").isNotNull, 1L)
          .otherwise(0L).as("t"))
      .agg(sum(col("a")), sum(col("b")), sum(col("t")))
      .as[(Long, Long, Long)].head()
    val t1 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE anchors+blocks+meta-500k: $t1%.1f s = ${nPages / t1 / 1e3}%.0f K pages/s, " +
      f"${htmlBytes / t1 / 1e6}%.0f MB/s HTML ($nAnchors anchors, $nBlocks blocks, $nTitles titles)")

    // 2) full boilerplate removal (segmentation + window smoothing +
    //    reassembly, ONE doc_id exchange), 500k pages
    val t2 = System.nanoTime()
    val kept = ta.extractMainText(pages, "html", "doc_id")
      .agg(sum(col("main_chars")), count(lit(1))).as[(Long, Long)].head()
    val t3 = (System.nanoTime() - t2) / 1e9
    println(f"DRIVE boilerplate-500k: $t3%.1f s = ${nPages / t3 / 1e3}%.0f K pages/s, " +
      f"${htmlBytes / t3 / 1e6}%.0f MB/s HTML in (${kept._1 / 1e6}%.0f M main chars kept)")
    pages.unpersist()

    // 3) Bloom-pruned exact anti-join vs plain exact anti-join, in the
    //    operator's REGIME: the seen set too big to broadcast (threshold
    //    off forces the shuffle join a 10^9-URL seen set would force
    //    anyway). 8M discovered URLs vs a 2M-URL seen set, 75% new.
    val seen = spark.range(2000000L)
      .select(concat(lit("http://h"), col("id") % 65536, lit(".invalid/p/"), col("id")).as("url"))
    val discovered = spark.range(8000000L)
      .select(concat(lit("http://h"), col("id") % 65536, lit(".invalid/p/"), col("id")).as("url"))
      .cache()
    discovered.count() // materialize
    val tE0 = System.nanoTime()
    val exactBcastN = discovered.join(seen, Seq("url"), "left_anti").count()
    val tEb = (System.nanoTime() - tE0) / 1e9
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val tE1 = System.nanoTime()
    val exactN = discovered.join(seen, Seq("url"), "left_anti").count()
    val tE = (System.nanoTime() - tE1) / 1e9
    val tB0 = System.nanoTime()
    val prunedN = graft.operators.BloomTools
      .prunedAntiJoin(discovered, "url", seen, "url", expectedItems = 2000000L, fpp = 0.01)
      .count()
    val tB = (System.nanoTime() - tB0) / 1e9
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    require(prunedN == exactN && exactBcastN == exactN,
      s"pruned $prunedN != exact $exactN / $exactBcastN")
    println(f"DRIVE pruned-anti-join-8M: bloom $tB%.1f s vs exact-shuffle $tE%.1f s " +
      f"vs exact-broadcast $tEb%.1f s (${8000000L / tB / 1e6}%.1f M urls/s pruned, " +
      f"identical $exactN%d survivors; the prune pays when the seen set " +
      "outgrows broadcast)")
    discovered.unpersist()

    // 4) budget apportionment, 1M hosts x 1024 shards: exact sum audit
    val hosts = spark.range(1000000L)
      .select(concat(lit("h"), col("id")).as("host"),
        (col("id") % 1024).as("shard"),
        (col("id") % 997 + 1).as("weight"))
    val t4 = System.nanoTime()
    val total = graft.operators.LinkGraph
      .allocateBudget(hosts, "host", "weight", "shard", total = 1000000000L)
      .agg(sum(col("alloc"))).as[Long].head()
    val t5 = (System.nanoTime() - t4) / 1e9
    require(total == 1000000000L, s"allocation sum $total != budget")
    println(f"DRIVE budget-1M-hosts: $t5%.1f s = ${1000000L / t5 / 1e3}%.0f K hosts/s, " +
      s"sum(alloc) == 1,000,000,000 exactly")

    spark.stop()
  }
}
