package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose tx_wiki_dump's Spark cost (fixture vs explode vs
  * sort) at sf0.1.
  */
object WikiProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WIKIPROBE $tag%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (0 until 2).foreach { round =>
      println(s"--- round $round")
      time("archives-only") {
        graft.operators.Ingest.wikiArchives(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time("explode-no-sort") {
        graft.operators.Ingest.wikiArchives(spark, sfDir)
          .flatMap { r =>
            graft.operators.MediaWiki.parseDump(
              graft.operators.Bzip2.decompress(r.content))
              .map { p =>
                val text = graft.operators.MediaWiki.cleanWikitext(p.wikitext)
                (p.pageId, p.title, p.ns, p.username, text, text.length.toLong)
              }
          }.write.format("noop").mode("overwrite").save()
      }
      time("full-query") {
        graft.SparkEntry.queries("tx_wiki_dump")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
