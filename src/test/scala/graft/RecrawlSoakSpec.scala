package graft

/** Anchor-BM25F under recrawl churn (verdict item 8): every batch of the
  * recrawl→tombstone→NRT-segment→merge loop must leave the anchor-boosted
  * ranking rank-identical (urls AND 6-dp scores) to a from-scratch rebuild
  * of the same snapshot. RecrawlSoak.run asserts it internally per batch.
  */
class RecrawlSoakSpec extends SparkTestBase {

  test("recrawl->NRT->merge loop is rank-identical to fresh builds") {
    val workDir = tmpDir("soak")
    val (upd, sch) = RecrawlSoak.run(spark, workDir, n = 800L, batches = 3,
      assertIdentity = true)
    assert(upd.size == 3 && sch.size == 3)
  }

  test("snapshot churn actually exercises gone/changed/new") {
    val s0 = RecrawlSoak.snapshot(800L, 0)
    val s1 = RecrawlSoak.snapshot(800L, 1)
    val gone = s0.keySet -- s1.keySet
    val added = s1.keySet -- s0.keySet
    val changed = s0.keySet.intersect(s1.keySet)
      .filter(i => s0(i) != s1(i))
    assert(gone.nonEmpty, "no pages went away")
    assert(added.nonEmpty, "no new pages")
    assert(changed.nonEmpty, "no changed pages")
    // and churn is monotone-consistent across batches
    val s2 = RecrawlSoak.snapshot(800L, 2)
    assert(gone.intersect(s2.keySet).isEmpty, "gone pages resurrected")
  }
}
