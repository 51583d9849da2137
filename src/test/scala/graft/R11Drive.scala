package graftdrive

import org.apache.spark.sql.SparkSession

/** Round-11 drive: run the new zstd / PDF-1.5 contract queries at
  * sf0.001 and print row counts + a sample, before the full Verify lap.
  */
object R11Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for (q <- Seq("tx_pdf_text15", "tx_pdf_filters", "tx_warc_zstd",
      "tx_zstd_encoding", "tx_pdf_modern", "tx_office_text", "tx_mail_mbox",
      "tx_sheet_text", "tx_feed_discovery", "tx_book_text", "tx_doc_probe",
      "tx_doc_mine")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val rows = df.collect()
      println(s"R11 $q rows=${rows.length} head=${rows.headOption.getOrElse("-")}")
    }
    spark.stop()
  }
}
