package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based guarantees for the frequency/quantile sketch cores
  * (no Spark session — pure sketch algebra, mirrors HllPropertiesSpec).
  */
class SketchPropertiesSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val itemsGen = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.oneOf("hot", "hot", "hot", "warm")))

  private def cms(items: Seq[String], depth: Int = 4, width: Int = 64): CmsSketch = {
    val s = new CmsSketch(depth, width)
    items.foreach(s.add(_))
    s
  }

  test("CMS never undercounts, merge is commutative, serde round-trips") {
    forAllSeeded(Gen.zip(itemsGen, itemsGen)) { case (xs, ys) =>
      val merged1 = cms(xs).merge(cms(ys))
      val merged2 = cms(ys).merge(cms(xs))
      assert(merged1.counts.toSeq == merged2.counts.toSeq, "merge not commutative")
      assert(merged1.total == xs.length + ys.length)
      // estimate >= true frequency for every key, in any sketch
      val all = xs ++ ys
      all.distinct.foreach { item =>
        val exact = all.count(_ == item).toLong
        assert(merged1.query(item) >= exact,
          s"undercount for '$item': ${merged1.query(item)} < $exact")
      }
      // wire round-trip preserves every counter
      val rt = CmsSketch.deserialize(merged1.serialize())
      assert(rt.counts.toSeq == merged1.counts.toSeq && rt.total == merged1.total)
    }
  }

  test("CMS merge = build-on-concatenation (distributive over partitioning)") {
    forAllSeeded(Gen.zip(itemsGen, itemsGen)) { case (xs, ys) =>
      val merged = cms(xs).merge(cms(ys))
      val direct = cms(xs ++ ys)
      assert(merged.counts.toSeq == direct.counts.toSeq,
        "partition-then-merge must equal single-pass build")
    }
  }

  test("CMS rejects dimension-mismatched merges") {
    intercept[IllegalArgumentException] {
      new CmsSketch(4, 64).merge(new CmsSketch(4, 128))
    }
  }

  test("GK buffer: quantiles within rank-error bound under random data") {
    val valsGen = Gen.listOfN(500, Gen.chooseNum(0.0, 1000.0))
    forAllSeeded(valsGen, n = 30) { vs =>
      val b = new GkBuffer(0.05)
      vs.foreach(b.add)
      val sorted = vs.sorted
      Seq(0.1, 0.5, 0.9).foreach { q =>
        b.compressed().query(q).foreach { est =>
          // with duplicates the estimate's rank is a RANGE (its tie block);
          // the target rank must fall within eps*n of that range
          val lo = sorted.count(_ < est)
          val hi = sorted.count(_ <= est)
          val target = q * vs.length
          val eps = 0.05 * vs.length + 1
          assert(target >= lo - eps && target <= hi + eps,
            s"q=$q est=$est rankRange=[$lo,$hi] target=$target n=${vs.length}")
        }
      }
      // serde round-trip answers identically
      val rt = GkBuffer.deserialize(b.serialize())
      Seq(0.25, 0.75).foreach { q =>
        assert(rt.compressed().query(q) == b.compressed().query(q))
      }
    }
  }

  private def kmv(items: Seq[String], k: Int = 32): KmvSketch = {
    val s = new KmvSketch(k)
    items.foreach(s.add(_))
    s
  }

  test("KMV merge is commutative, associative, idempotent; equals single-pass build") {
    forAllSeeded(Gen.zip(itemsGen, itemsGen, itemsGen)) { case (xs, ys, zs) =>
      val ab = kmv(xs).merge(kmv(ys))
      val ba = kmv(ys).merge(kmv(xs))
      assert(ab.serialize().toSeq == ba.serialize().toSeq, "merge not commutative")
      val abThenC = kmv(xs).merge(kmv(ys)).merge(kmv(zs))
      val aThenBc = kmv(xs).merge(kmv(ys).merge(kmv(zs)))
      assert(abThenC.serialize().toSeq == aThenBc.serialize().toSeq, "merge not associative")
      val direct = kmv(xs ++ ys)
      assert(ab.serialize().toSeq == direct.serialize().toSeq,
        "partition-then-merge must equal single-pass build")
      assert(ab.merge(kmv(xs)).serialize().toSeq == direct.serialize().toSeq,
        "re-merging a subset must be a no-op (idempotent)")
    }
  }

  test("KMV is exact below capacity; jaccard bounded in [0,1]; serde round-trips") {
    forAllSeeded(Gen.zip(itemsGen, itemsGen)) { case (xs, ys) =>
      val a = kmv(xs, k = 4096) // capacity >> generated list sizes
      assert(a.estimate == xs.distinct.size.toDouble, "below-capacity estimate not exact")
      val b = kmv(ys, k = 4096)
      val j = KmvSketch.jaccard(a, b)
      assert(j >= 0.0 && j <= 1.0)
      val exactJ =
        if (xs.isEmpty && ys.isEmpty) 0.0
        else xs.toSet.intersect(ys.toSet).size.toDouble / xs.toSet.union(ys.toSet).size
      assert(math.abs(j - exactJ) < 1e-12, s"below-capacity jaccard $j != $exactJ")
      val rt = KmvSketch.deserialize(a.serialize())
      assert(rt.serialize().toSeq == a.serialize().toSeq && rt.estimate == a.estimate)
    }
  }

  test("KMV rejects k-mismatched merges") {
    intercept[IllegalArgumentException] {
      new KmvSketch(32).merge(new KmvSketch(64))
    }
  }
}
