package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HtmlAbDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = spark.range(1000000L).select(col("id"),
        concat(
          lit("<html><head><title>p</title><style>body{margin:0}</style></head><body><!-- c -->"),
          lit("<h1>Page "), col("id"), lit("</h1>"),
          lit(("<p>the quick brown fox &amp; seventeen magpies argue about " +
            "parquet footers &lt;inline&gt; while shuffle partitions idle</p>") * 8),
          lit("<script>var x = 1 < 2 && \"</p>\";</script></body></html>")).as("html"))
      .localCheckpoint()
    def chain(html: org.apache.spark.sql.Column) = {
      val t0 = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
      val t1 = regexp_replace(t0, "(?s)<style[^>]*>.*?</style>", " ")
      val t2 = regexp_replace(t1, "(?s)<!--.*?-->", " ")
      val t3 = regexp_replace(t2, "<[^>]*>", " ")
      val d = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
        .foldLeft(t3) { case (c, (e, r)) => regexp_replace(c, java.util.regex.Pattern.quote(e), r) }
      trim(regexp_replace(d, "[ \t\n\r\f]+", " "))
    }
    for (_ <- 0 until 2) {
      var t0 = System.nanoTime()
      pages.select(graft.operators.TextAnalysis.htmlToText(col("html")).as("t"))
        .write.format("noop").mode("overwrite").save()
      val tN = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      pages.select(chain(col("html")).as("t"))
        .write.format("noop").mode("overwrite").save()
      val tC = (System.nanoTime() - t0) / 1e9
      println(f"AB native=$tN%.1f s chain=$tC%.1f s ratio=${tC / tN}%.1f x")
    }
    spark.stop()
  }
}
