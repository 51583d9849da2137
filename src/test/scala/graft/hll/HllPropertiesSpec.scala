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

  test("sparse wire format: low-occupancy sketches shrink, all occupancies round-trip") {
    // empty and tiny sketches serialize sparse: size tracks occupancy not m
    val k = 1 << 18
    val empty = HllSketch.empty(k, 64)
    assert(empty.serialize().length == 10, "empty sketch should be header-only sparse")
    val tiny = HllSketch.empty(k, 64)
    (0 until 10).foreach(i => tiny.update(s"v$i"))
    val tinyBytes = tiny.serialize()
    assert(tinyBytes.length <= 10 + 4 * 10, s"10-distinct sketch was ${tinyBytes.length} B")
    val rtTiny = HllSketch.deserialize(tinyBytes)
    assert(rtTiny.registers.toSeq == tiny.registers.toSeq && rtTiny.bits == 64)
    assert(rtTiny.cardinality == tiny.cardinality)
    // a full sketch falls back to dense (6 + m) and round-trips too
    val full = HllSketch.empty(1 << 6, 64)
    (0 until 10000).foreach(i => full.update(s"x$i"))
    assert(full.serialize().length == 6 + (1 << 6))
    val rtFull = HllSketch.deserialize(full.serialize())
    assert(rtFull.registers.toSeq == full.registers.toSeq)
    // crossover: sparse never larger than dense would have been
    (1 to 5).foreach { scale =>
      val h = HllSketch.empty(4096, 64)
      (0 until scale * 300).foreach(i => h.update(s"c$i"))
      assert(h.serialize().length <= 6 + 4096)
    }
    // 32-bit flag survives the sparse marker bit
    val h32 = HllSketch.empty(256, 32)
    h32.update("abc")
    val rt32 = HllSketch.deserialize(h32.serialize())
    assert(rt32.bits == 32 && rt32.registers.toSeq == h32.registers.toSeq)
  }
}
