package graft

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, LiveSet, Manifest}
import graft.search.{IndexSearcher, Query}

/** segments_N live-set protocol: atomic swap visibility, crash-window
  * semantics (merged inputs left on disk are invisible and GC-able), and
  * legacy fallback.
  */
class LiveSetSpec extends SparkTestBase {

  private val cfg = IndexConfig(bucketShift = 10, numPostingPartitions = 4, numDocPartitions = 2)

  private def buildSeg(dir: String, name: String, start: Long, n: Long): Unit = {
    import spark.implicits._
    val pages = Corpus.pages(spark, n, start = start).map(p => (p.url, p.text))
    IndexBuilder.buildSegment(pages, s"$dir/$name", cfg)
    ()
  }

  test("live set gates visibility: un-deleted merge inputs are not read twice") {
    val dir = tmpDir("liveset")
    buildSeg(dir, "seg00", 0, 500)
    buildSeg(dir, "seg01", 500, 500)
    LiveSet.add(dir, Seq("seg00", "seg01"))
    assert(IndexSearcher.open(spark, dir).stats.docCount == 1000)

    // merge, commit the swap, but CRASH before deleting the inputs:
    // both input dirs still exist on disk with valid manifests
    val inputs = LiveSet.manifests(dir).map(_.dir)
    graft.index.SegmentMerger.merge(spark, inputs, s"$dir/merge00", cfg)
    LiveSet.swap(dir, Seq("seg00", "seg01"), Seq("merge00"))
    assert(new java.io.File(s"$dir/seg00").isDirectory, "simulated crash: inputs remain")

    // a reader sees exactly the merged segment — no double counting
    val se = IndexSearcher.open(spark, dir)
    assert(se.segments.map(_.dir) == Seq(s"$dir/merge00"))
    assert(se.stats.docCount == 1000)
    val an = graft.analysis.StandardAnalyzer.Default
    assert(se.count(Query.parse("court")) ==
      (0L until 1000L).count(id => an.tokens(Corpus.page(id).text).exists(_.term == "court")))

    // GC removes the orphaned inputs; the live segment survives
    val gone = LiveSet.gcOrphans(dir).sorted
    assert(gone == Seq("seg00", "seg01"))
    assert(!new java.io.File(s"$dir/seg00").exists)
    assert(Manifest.read(s"$dir/merge00").isDefined)
    assert(IndexSearcher.open(spark, dir).stats.docCount == 1000)
  }

  test("add is idempotent; generations increase; old generations pruned") {
    val dir = tmpDir("liveset-gen")
    buildSeg(dir, "seg00", 0, 200)
    val g1 = LiveSet.add(dir, Seq("seg00"))
    val g2 = LiveSet.add(dir, Seq("seg00")) // replayed batch
    assert(g2 == g1 + 1)
    assert(LiveSet.read(dir).get._2 == Seq("seg00"))
    (0 until 8).foreach(_ => LiveSet.add(dir, Seq("seg00")))
    val gens = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("segments_"))
    assert(gens <= 6, s"old generations should be pruned, found $gens")
  }

  test("update-by-url: one version per url after reopen; replay idempotent") {
    import spark.implicits._
    val dir = tmpDir("updater")
    buildSeg(dir, "seg00", 0, 400)
    LiveSet.add(dir, Seq("seg00"))
    val before = IndexSearcher.open(spark, dir)
    assert(before.stats.docCount == 400)

    // replace 3 docs with new text containing a marker term
    val targets = Seq(0L, 7L, 123L).map(Corpus.page(_).url)
    val updated = targets.map(u => (u, "zzupdated marker body content")).toDS()
    graft.index.Updater.updateByUrls(spark, dir, "upd_001", updated,
      cfg.copy(numDocPartitions = 1))

    val se = IndexSearcher.open(spark, dir)
    // marker matches exactly the 3 updated docs, resolving to their urls
    assert(se.count(Query.parse("zzupdated")) == 3)
    val hitUrls = se.fetchDocs(se.topK(Query.parse("zzupdated"), 10).collect())
      .select("url").as[String].collect().sorted.toSeq
    assert(hitUrls == targets.sorted)
    assert(se.hasDeletes)
    // the old versions are invisible: a term from the original doc 0 text
    // no longer matches doc 0's old docId
    val oldDoc0 = se.docsTable.where($"url" === targets.head)
      .select("docId").as[Long].collect().toSet
    val oldTermMatches = se.matching(Query.parse("court")).collect().toSet
    assert(!oldTermMatches.exists(d =>
      oldDoc0.contains(d) && !hitUrls.contains(targets.head)))

    // replaying the same update batch is a no-op on counts
    graft.index.Updater.updateByUrls(spark, dir, "upd_001", updated,
      cfg.copy(numDocPartitions = 1))
    val se2 = IndexSearcher.open(spark, dir)
    assert(se2.count(Query.parse("zzupdated")) == 3)
    assert(se2.matching(Query.parse("zzupdated")).collect().length == 3)
  }

  test("SearcherManager: acquire is stable; maybeRefresh follows the live set") {
    val dir = tmpDir("sm")
    buildSeg(dir, "seg00", 0, 300)
    LiveSet.add(dir, Seq("seg00"))
    val mgr = new graft.search.SearcherManager(spark, dir)
    val s1 = mgr.acquire()
    assert(s1.stats.docCount == 300)
    assert(!mgr.maybeRefresh(), "no live-set change -> no refresh")
    assert(mgr.acquire() eq s1)

    buildSeg(dir, "seg01", 300, 200)
    LiveSet.add(dir, Seq("seg01"))
    assert(mgr.acquire() eq s1, "acquire stays stable until refresh")
    assert(mgr.maybeRefresh(), "live-set advanced -> refresh")
    assert(mgr.acquire().stats.docCount == 500)
    assert(!mgr.maybeRefresh())
  }

  test("legacy seed: first generational commit keeps pre-existing segments") {
    val dir = tmpDir("liveset-legacy-seed")
    buildSeg(dir, "seg0", 0, 300) // legacy layout: committed dir, no segments_N
    assert(LiveSet.read(dir).isEmpty)
    buildSeg(dir, "seg1", 300, 200)
    LiveSet.add(dir, Seq("seg1")) // must seed from the legacy listing
    assert(LiveSet.read(dir).get._2.toSet == Set("seg0", "seg1"))
    assert(LiveSet.gcOrphans(dir).isEmpty, "seg0 must not become GC-able")
    assert(IndexSearcher.open(spark, dir).stats.docCount == 500)
    // swap over a legacy layout seeds too
    val dir2 = tmpDir("liveset-legacy-swap")
    buildSeg(dir2, "segA", 0, 100)
    buildSeg(dir2, "segB", 100, 100)
    LiveSet.swap(dir2, Seq("segB"), Seq.empty)
    assert(LiveSet.read(dir2).get._2 == Seq("segA"))
  }

  test("legacy fallback: no segments_N file -> directory listing") {
    val dir = tmpDir("liveset-legacy")
    buildSeg(dir, "seg0", 0, 300)
    assert(LiveSet.read(dir).isEmpty)
    assert(IndexSearcher.open(spark, dir).stats.docCount == 300)
    assert(LiveSet.gcOrphans(dir).isEmpty, "GC must be a no-op without a live set")
  }

  test("hot backup: snapshot-pinned copy is self-contained and immune to source churn") {
    val dir = tmpDir("liveset-backup")
    val dest = tmpDir("liveset-backup-dest")
    buildSeg(dir, "seg00", 0, 300)
    buildSeg(dir, "seg01", 300, 200)
    LiveSet.add(dir, Seq("seg00", "seg01"))
    val segs = LiveSet.backup(dir, dest)
    assert(segs.toSet == Set("seg00", "seg01"))
    assert(LiveSet.snapshots(dir).isEmpty, "backup releases its pin")
    // churn the source: replace everything with a new segment and GC
    buildSeg(dir, "seg02", 500, 100)
    LiveSet.swap(dir, Seq("seg00", "seg01"), Seq("seg02"))
    LiveSet.gcOrphans(dir)
    assert(!new java.io.File(s"$dir/seg00").exists)
    // the backup still opens to the snapshot's doc set
    val se = IndexSearcher.open(spark, dest)
    assert(se.stats.docCount == 500)
    assert(graft.index.CheckIndex.check(spark, s"$dest/seg00").ok)
    assert(IndexSearcher.open(spark, dir).stats.docCount == 100)
  }

  test("snapshot pins a commit point through pruning and GC; rollback restores it") {
    val dir = tmpDir("liveset-snap")
    buildSeg(dir, "seg00", 0, 300)
    LiveSet.add(dir, Seq("seg00"))
    val snapGen = LiveSet.snapshot(dir).get
    assert(LiveSet.snapshots(dir) == Seq(snapGen))

    // replace seg00 with a merged/updated segment, then churn generations
    // far past the keep-5 window
    buildSeg(dir, "seg01", 300, 200)
    LiveSet.swap(dir, Seq("seg00"), Seq("seg01"))
    (0 until 8).foreach(_ => LiveSet.add(dir, Seq("seg01")))

    // the snapshotted generation FILE survived pruning; the seg00 DIR
    // survived orphan GC despite not being live
    assert(LiveSet.readGen(dir, snapGen).contains(Seq("seg00")))
    assert(LiveSet.gcOrphans(dir).isEmpty, "snapshot-pinned segment must not be collected")
    assert(new java.io.File(s"$dir/seg00").isDirectory)
    assert(IndexSearcher.open(spark, dir).stats.docCount == 200) // live = seg01

    // rollback: reader sees exactly the snapshot's doc set again
    LiveSet.rollback(dir, snapGen)
    val se = IndexSearcher.open(spark, dir)
    assert(se.segments.map(_.dir) == Seq(s"$dir/seg00"))
    assert(se.stats.docCount == 300)
    // seg01 fell out of the live set and is collectable now
    assert(LiveSet.gcOrphans(dir) == Seq("seg01"))

    // release: the pin goes away; after the file ages out of the keep
    // window, rollback to it must fail fast
    LiveSet.release(dir, snapGen)
    assert(LiveSet.snapshots(dir).isEmpty)
    (0 until 8).foreach(_ => LiveSet.add(dir, Seq("seg00")))
    assert(LiveSet.readGen(dir, snapGen).isEmpty, "released generation file must age out")
    intercept[IllegalArgumentException](LiveSet.rollback(dir, snapGen))
  }
}
