package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{SegmentManifest, TieredMergePolicy}

/** Driver-side tiered merge planning (pure logic, no Spark): budget walk,
  * window scoring, over-size exclusion — the policy shape of the reference's
  * `TieredMergePolicy.findMerges` (`index/TieredMergePolicy.java:317-423`).
  */
class MergePolicySpec extends AnyFunSuite {

  private def seg(dir: String, blocks: Long): SegmentManifest =
    SegmentManifest(
      segmentId = dir, dir = dir, docCount = blocks * 10, maxDocId = blocks * 10,
      sumTotalTermFreq = blocks * 100, termCount = blocks, blockCount = blocks,
      bucketShift = 14, buildWallSec = 0.0, lineage = Seq.empty)

  test("few balanced segments are within budget: no merge") {
    val segs = (1 to 4).map(i => seg(s"s$i", 5000L))
    assert(TieredMergePolicy.findMerges(segs) == Seq.empty)
  }

  test("over-budget mixed tiers merge the smallest tier") {
    // 12 mid segments + 8 small ones exceed the tier budget; the
    // skew-scored window selection must pick the small tier (balanced,
    // low-cost merge), not a window containing mid segments
    val segs = (1 to 12).map(i => seg(f"m$i%02d", 2000L)) ++
      (1 to 8).map(i => seg(f"t$i%02d", 1000L))
    val merges = TieredMergePolicy.findMerges(segs)
    assert(merges.size == 1)
    val m = merges.head
    assert(m.size == TieredMergePolicy.MaxMergeAtOnce)
    assert(m.forall(_.startsWith("t")), s"expected the small tier, got $m")
  }

  test("segments above maxMergedBlocks/2 never participate") {
    val segs = (1 to 20).map(i => seg(s"s$i", if (i <= 2) 100000L else 100L))
    val merges = TieredMergePolicy.findMerges(segs, maxMergedBlocks = 10000L)
    merges.flatten.foreach(d => assert(d != "s1" && d != "s2"))
  }

  test("merge result is deterministic for equal-size segments") {
    val segs = (1 to 20).map(i => seg(f"s$i%02d", 1000L))
    val a = TieredMergePolicy.findMerges(segs)
    val b = TieredMergePolicy.findMerges(segs.reverse)
    assert(a == b)
    assert(a.nonEmpty)
  }
}
