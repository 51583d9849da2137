package graft.tools

/** Scratch micro-profile of the wiki-dump fixture path: where do the
  * per-shard milliseconds go (writeDump / compress / decompress /
  * parse / clean)?
  */
object BzProfile {
  def main(args: Array[String]): Unit = {
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-12s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }
    (0 until 3).foreach { round =>
      println(s"--- round $round (313 shards x 16 pages)")
      val shards = time("writeDump") {
        (0 until 313).map { sid =>
          graft.operators.MediaWiki.writeDump(
            (sid * 16 until sid * 16 + 16).map(i => graft.operators.Ingest.wikiPage(i.toLong)))
        }
      }
      val packed = time("compress") { shards.map(graft.operators.Bzip2.compress(_)) }
      val back = time("decompress") { packed.map(graft.operators.Bzip2.decompress(_)) }
      val pages = time("parse") { back.map(graft.operators.MediaWiki.parseDump) }
      time("clean") { pages.foreach(_.foreach(p => graft.operators.MediaWiki.cleanWikitext(p.wikitext))) }
      println(s"shard bytes ~${shards.head.length}, packed ~${packed.head.length}")
    }
  }
}
