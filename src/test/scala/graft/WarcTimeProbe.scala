package graftdrive

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for the WARC-family contract queries — full noop
  * materialization like Bench, isolated from the 188-query lap so
  * neighbor/GC effects are excluded. Not part of any suite.
  */
object WarcTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tx_warc_ingest", "tx_warc_curation", "tx_warc_cdx", "tx_zip_members")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run) // warm lap
    names.foreach { n =>
      val a = run(n); val b = run(n)
      println(f"TIME $n: min ${math.min(a, b)}%.2f s (laps $a%.2f / $b%.2f)")
    }
    spark.stop()
  }
}
