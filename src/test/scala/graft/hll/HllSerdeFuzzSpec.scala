package graft.hll

import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-buffer hardening for [[HllSketch.deserialize]]: any mangled
  * input must either round-trip to a valid sketch or fail with a clean
  * `IllegalArgumentException` — never a raw AIOOBE/NegativeArraySize from
  * trusting header fields. Sketch wire bytes cross system boundaries
  * (parquet columns, stream state stores), so a flipped bit must not be
  * able to crash an executor with an unclassified error.
  */
class HllSerdeFuzzSpec extends AnyFunSuite {

  private def sketch(k: Int, bits: Int, n: Int): HllSketch = {
    val h = HllSketch.empty(k, bits)
    (0 until n).foreach(i => h.update(s"elem-$i"))
    h
  }

  private def clean(t: Throwable): Boolean = t.isInstanceOf[IllegalArgumentException]

  test("round-trip still exact for sparse and dense encodings") {
    for ((k, bits, n) <- Seq((1 << 12, 64, 50), (1 << 12, 64, 20000), (250, 32, 500))) {
      val h = sketch(k, bits, n)
      val back = HllSketch.deserialize(h.serialize)
      assert(back.cardinality == h.cardinality, s"k=$k bits=$bits n=$n")
    }
  }

  test("every truncation of a valid buffer fails cleanly") {
    for ((k, bits, n) <- Seq((1 << 12, 64, 50), (250, 32, 500))) {
      val full = sketch(k, bits, n).serialize
      (0 until full.length).foreach { len =>
        val e = intercept[Throwable](HllSketch.deserialize(full.take(len)))
        assert(clean(e), s"len=$len threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("single-byte corruption never escapes as an unclassified error") {
    val rnd = new scala.util.Random(42)
    val full = sketch(1 << 12, 64, 50).serialize
    (0 until full.length).foreach { pos =>
      (0 until 8).foreach { _ =>
        val mut = full.clone()
        mut(pos) = (mut(pos) ^ (1 << rnd.nextInt(8))).toByte
        try {
          val h = HllSketch.deserialize(mut)
          h.cardinality // must also be usable, not just constructible
        } catch {
          case t: Throwable =>
            assert(clean(t), s"pos=$pos threw ${t.getClass.getName}: ${t.getMessage}")
        }
      }
    }
  }

  test("hostile header fields fail cleanly") {
    // absurd k in the header of an otherwise-tiny buffer: must not allocate
    // or index by the claimed 2^18 registers
    val b = sketch(1 << 12, 64, 50).serialize
    val huge = b.clone()
    huge(2) = 0x7f.toByte // k high byte → claims k ≈ 2^30
    assert(clean(intercept[Throwable](HllSketch.deserialize(huge))))
    // sparse count field far beyond the actual payload
    val sp = sketch(1 << 12, 64, 50).serialize
    assert((sp(0) & 0x80) != 0, "expected sparse encoding for this fixture")
    val lie = sp.clone()
    lie(6) = 0x7f.toByte
    assert(clean(intercept[Throwable](HllSketch.deserialize(lie))))
    // unknown hash id (bits 5-7 of byte 1)
    val hh = sp.clone()
    hh(1) = (hh(1) | 0xe0).toByte
    assert(clean(intercept[Throwable](HllSketch.deserialize(hh))))
  }

  test("register values beyond bits-p+1 are rejected, not stored") {
    val h = sketch(1 << 12, 64, 50)
    val b = h.serialize
    assert((b(0) & 0x80) != 0)
    val mut = b.clone()
    mut(9 + 4) = 0x7f.toByte // first sparse entry's rho → 127 (max legal is 53)
    assert(clean(intercept[Throwable](HllSketch.deserialize(mut))))
  }

  test("random garbage buffers fail cleanly") {
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      try HllSketch.deserialize(b).cardinality
      catch {
        case t: Throwable =>
          assert(clean(t), s"iter=$i threw ${t.getClass.getName}: ${t.getMessage}")
      }
    }
  }
}
