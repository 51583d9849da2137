package graft.hll

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based suite (generalizes the reference's example-based tests,
  * ref test_HyperLogLog.py:123-161 and test_examples.py:88-98).
  */
class HllPropertiesSpec extends AnyFunSuite {

  /** scalatestplus isn't in the offline dep cache; drive ScalaCheck Gens
    * directly with deterministic seeds (100 samples per property).
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val kGen = Gen.oneOf(16, 64, 250, 1024, 4096)
  private val bitsGen = Gen.oneOf(32, 64)
  private val itemsGen = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))

  private def build(k: Int, bits: Int, items: Seq[String]): HllSketch = {
    val h = HllSketch.empty(k, bits)
    items.foreach(h.update)
    h
  }

  test("merge is commutative, associative, idempotent") {
    forAllSeeded(Gen.zip(kGen, bitsGen, itemsGen, itemsGen, itemsGen)) {
      case (k, bits, xs, ys, zs) =>
        val (a, b, c) = (build(k, bits, xs), build(k, bits, ys), build(k, bits, zs))
        val ab = a.copySketch().merge(b)
        val ba = b.copySketch().merge(a)
        assert(ab.registers.toSeq == ba.registers.toSeq)
        val abc1 = a.copySketch().merge(b).merge(c)
        val abc2 = a.copySketch().merge(b.copySketch().merge(c))
        assert(abc1.registers.toSeq == abc2.registers.toSeq)
        assert(ab.copySketch().merge(ab).registers.toSeq == ab.registers.toSeq)
    }
  }

  test("insert order and duplication never change the sketch") {
    forAllSeeded(Gen.zip(kGen, bitsGen, itemsGen)) { case (k, bits, xs) =>
      val shuffled = scala.util.Random.shuffle(xs)
      val doubled = xs ++ xs
      assert(build(k, bits, xs).registers.toSeq == build(k, bits, shuffled).registers.toSeq)
      assert(build(k, bits, xs).registers.toSeq == build(k, bits, doubled).registers.toSeq)
    }
  }

  test("partition invariance: sketch of whole = merge of any split") {
    forAllSeeded(Gen.zip(kGen, bitsGen, itemsGen, Gen.chooseNum(1, 7))) {
      case (k, bits, xs, nSplits) =>
        val whole = build(k, bits, xs)
        val parts = xs.grouped(math.max(1, xs.length / nSplits + 1)).toList
        val merged = parts.map(p => build(k, bits, p))
          .foldLeft(HllSketch.empty(k, bits))((acc, s) => acc.merge(s))
        assert(whole.registers.toSeq == merged.registers.toSeq)
        assert(whole.cardinality == merged.cardinality)
    }
  }

  test("estimate within statistical bounds for distinct string sets") {
    // 64-bit estimator at n >> m is biased (reference quirk), so bound-check
    // at n <= m where linear counting dominates, plus the 32-bit estimator
    // in its accurate range
    forAllSeeded(Gen.chooseNum(100, 2000), n = 30) { n =>
      val k = 4096
      val h = HllSketch.empty(k, 64)
      (0 until n).foreach(i => h.update(s"item-$i-x"))
      val err = math.abs(h.cardinality - n) / n.toDouble
      assert(err < 5 * 1.04 / math.sqrt(1 << 12), s"n=$n err=$err")
    }
  }

  test("serde round-trip is identity for arbitrary contents") {
    forAllSeeded(Gen.zip(kGen, bitsGen, itemsGen)) { case (k, bits, xs) =>
      val h = build(k, bits, xs)
      val rt = HllSketch.deserialize(h.serialize())
      assert(rt.k == h.k && rt.bits == h.bits && rt.registers.toSeq == h.registers.toSeq)
    }
  }
}
