package graftdrive
import org.apache.spark.sql.SparkSession
object SqlFuncsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").createOrReplaceTempView("docs")
    spark.sql("""
      SELECT sorted_jaccard(winnowing_fingerprint(a.text), winnowing_fingerprint(b.text)) AS winnow,
             sorted_jaccard(shingle_hashes(a.text), shingle_hashes(b.text)) AS shingle,
             simhash64(a.text) AS sh, size(minhash_signature(a.text, 32)) AS siglen
      FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id = 7
    """).show(false)
    // probe: wrong arg type
    try spark.sql("SELECT sorted_jaccard(1, 2)").collect()
    catch { case e: Exception => println("DRIVE badargs=" + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
