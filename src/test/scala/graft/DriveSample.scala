package graftdrive // outside graft.hll: consumes only the public API
object DriveSample {
  def main(args: Array[String]): Unit = {
    import graft.hll._
    val src = scala.io.Source.fromFile("/root/repo/src/test/resources/data.txt")
    val toks = try """-?\d+(?:\.\d+)?""".r.findAllIn(src.mkString).toArray finally src.close()
    val h = HllSketch.empty(1 << 12, 64)
    toks.foreach(h.update)
    println(s"DRIVE estimate=${h.cardinality} expected=645.2579301443818 exact=${toks.distinct.length}")
    val (l, r) = toks.splitAt(400)
    val hl = HllSketch.empty(1 << 12, 64); l.foreach(hl.update)
    val hr = HllSketch.empty(1 << 12, 64); r.foreach(hr.update)
    println(s"DRIVE merged-halves=${hl.copySketch().merge(hr).cardinality}")
    val rt = HllSketch.deserialize(HllSketch.empty(1 << 12, 64).serialize()).merge(hl).merge(hr)
    println(s"DRIVE serde-merged=${rt.cardinality}")
    try HllSketch.empty(5, 64) catch { case e: IllegalArgumentException => println(s"DRIVE badk=${e.getMessage}") }
    try hl.merge(HllSketch.empty(1 << 13, 64)) catch { case e: IllegalArgumentException => println(s"DRIVE badmerge=${e.getMessage}") }
    println(s"DRIVE empty32=${HllSketch.empty(16, 32).cardinality} empty64=${HllSketch.empty(16, 64).cardinality}")
  }
}
