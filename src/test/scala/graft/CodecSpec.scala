package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.codec.{BlockCodec, Impacts, SmallFloat}

/** Codec round-trip properties (FIXTURES.md F5, mirroring the reference's
  * BasePostingsFormatTestCase strategy).
  */
class CodecSpec extends AnyFunSuite with PropHelpers {

  // ---------------------------------------------------------- SmallFloat

  test("intToByte4 is exact below 40 and monotone everywhere") {
    for (i <- 0 until 40) assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(i)) == i)
    var prev = -1
    for (i <- 0 until 200000) {
      val q = SmallFloat.byte4ToInt(SmallFloat.intToByte4(i))
      assert(q <= i, s"quantized $q > raw $i")
      assert(q >= prev, "quantization must be monotone")
      prev = q
    }
  }

  test("byte4ToInt o intToByte4 is identity on decoded values") {
    for (b <- 0 until 256) {
      val v = SmallFloat.byte4ToInt(b.toByte)
      assert(java.lang.Byte.toUnsignedInt(SmallFloat.intToByte4(v)) == b)
    }
  }

  test("longToInt4 round trip on its own image + ordering") {
    forAll(Gen.choose(0L, Long.MaxValue / 2)) { v =>
      val e = SmallFloat.longToInt4(v)
      val d = SmallFloat.int4ToLong(e)
      assert(d <= v)
      assert(SmallFloat.longToInt4(d) == e)
    }
  }

  // ---------------------------------------------------------- bit packing

  private val genWidth = Gen.choose(0, 63)

  test("bitPack/bitUnpack round trip") {
    forAll(genWidth, Gen.choose(1, 300)) { (w, n) =>
      val max = if (w == 0) 0L else (1L << w) - 1
      val rnd = new scala.util.Random(w * 1000 + n)
      val vs = Array.fill(n)(if (max == 0) 0L else (rnd.nextLong() & Long.MaxValue) % (max + 1))
      val packed = BlockCodec.bitPack(vs, w)
      assert(BlockCodec.bitUnpack(packed, w, n).toSeq == vs.toSeq)
    }
  }

  test("forEncode/forDecode round trip") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1L << 40))) { vs0 =>
      val vs = vs0.toArray
      assert(BlockCodec.forDecode(BlockCodec.forEncode(vs)).toSeq == vs.toSeq)
    }
  }

  test("pforEncode/pforDecode round trip incl. outliers") {
    val gen = for {
      n <- Gen.choose(1, 128)
      base <- Gen.listOfN(n, Gen.choose(1L, 100L))
      outliers <- Gen.someOf(0 until n)
    } yield {
      val arr = base.toArray
      outliers.take(10).foreach(i => arr(i) = arr(i) * 1000000L)
      arr
    }
    forAll(gen) { vs =>
      assert(BlockCodec.pforDecode(BlockCodec.pforEncode(vs)).toSeq == vs.toSeq)
    }
  }

  test("pfor packs with at most 7 exceptions at reduced width") {
    // 120 small values + 5 huge → packed width must be small
    val vs = Array.fill(120)(3L) ++ Array.fill(5)(1L << 40)
    val enc = BlockCodec.pforEncode(vs)
    assert(BlockCodec.pforDecode(enc).toSeq == vs.toSeq)
    // FOR at 41 bits would need 125*41/8 ≈ 640B; pfor should be far smaller
    assert(enc.length < 200, s"pfor did not patch: ${enc.length} bytes")
  }

  test("delta encode/decode round trip on sorted ids") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1L << 30))) { ids0 =>
      val ids = ids0.distinct.sorted.toArray
      val deltas = BlockCodec.deltaEncode(ids, ids(0))
      assert(deltas(0) == 0)
      assert(BlockCodec.deltaDecode(deltas, ids(0)).toSeq == ids.toSeq)
    }
  }

  // ---------------------------------------------------------- impacts

  test("impact skyline keeps exactly the non-dominated pairs") {
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 50), Gen.choose(1, 255)))) { pairs =>
      val sky = Impacts.skyline(pairs)
      // strictly increasing in both coords
      sky.sliding(2).foreach {
        case Array(a, b) => assert(a.freq < b.freq && a.norm < b.norm)
        case _ =>
      }
      // every input pair is dominated by some skyline pair
      pairs.foreach { case (f, n) =>
        assert(sky.exists(s => s.freq >= f && s.norm <= n), s"($f,$n) not covered")
      }
      // every skyline pair is an input pair
      sky.foreach(s => assert(pairs.contains((s.freq, s.norm))))
      // round trip
      assert(Impacts.decode(Impacts.encode(sky)).toSeq == sky.toSeq)
    }
  }

  test("skylineInts (primitive hot path) == skyline (reference impl)") {
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 50), Gen.choose(1, 255)))) { pairs =>
      val freqs = pairs.map(_._1.toLong).toArray
      val norms = pairs.map(_._2).toArray
      val a = Impacts.skylineInts(freqs, norms, pairs.length).toSeq
      val b = Impacts.skyline(pairs).toSeq
      assert(a == b)
    }
  }

  test("impact maxScore bounds any member score") {
    val pairs = Seq((1, 10), (3, 40), (7, 200), (2, 5))
    val sky = Impacts.skyline(pairs)
    val score = (f: Int, n: Int) => f.toDouble / (1 + n)
    val bound = Impacts.maxScore(sky, score)
    pairs.foreach { case (f, n) => assert(score(f, n) <= bound + 1e-12) }
  }
}
