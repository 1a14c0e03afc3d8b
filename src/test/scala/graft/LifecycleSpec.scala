package graft

import graft.corpus.Corpus
import graft.index._
import graft.search.{IndexSearcher, Query, SearcherManager}

/** Capstone end-to-end lifecycle: batch ingest through the live set,
  * update-by-url, delete-by-url, a purging merge of everything — and the
  * final index must rank bit-identically (FloatExact) to a fresh
  * single-segment build of the logical corpus (originals, minus deletions,
  * with updates applied). Scores are compared by (score, url) since docID
  * layouts legitimately differ between the incremental and fresh builds.
  */
class LifecycleSpec extends SparkTestBase {

  private val cfg = IndexConfig(bucketShift = 10, numPostingPartitions = 4, numDocPartitions = 2)

  test("ingest -> update -> delete -> merge ranks identically to a fresh build") {
    import spark.implicits._
    val dir = tmpDir("lifecycle")
    val n = 800L

    // two ingest batches, live-set committed
    for ((start, name) <- Seq((0L, "seg00"), (400L, "seg01"))) {
      val pages = Corpus.pages(spark, 400L, start = start).map(p => (p.url, p.text))
      IndexBuilder.buildSegment(pages, s"$dir/$name", cfg)
      LiveSet.add(dir, Seq(name))
    }
    val mgr = new SearcherManager(spark, dir)
    assert(mgr.acquire().stats.docCount == n)

    // update two docs (replacement text with a marker term)
    val updTargets = Seq(3L, 777L).map(Corpus.page(_).url)
    val updated = updTargets.map(u => (u, "zzlifecycle updated content body")).toDS()
    Updater.updateByUrls(spark, dir, "upd_001", updated, cfg.copy(numDocPartitions = 1))
    assert(mgr.maybeRefresh())
    assert(mgr.acquire().count(Query.parse("zzlifecycle")) == 2)

    // delete two other docs across whichever live segments hold them
    val delTargets = Seq(5L, 600L).map(Corpus.page(_).url)
    LiveSet.manifests(dir).foreach(m => Deletes.deleteByUrls(spark, m.dir, delTargets))

    // merge EVERYTHING into one segment (tombstones purge physically)
    val inputs = LiveSet.manifests(dir).map(_.dir)
    val merged = SegmentMerger.merge(spark, inputs, s"$dir/final", cfg)
    LiveSet.swap(dir, inputs.map(d => new java.io.File(d).getName), Seq("final"))
    assert(mgr.maybeRefresh())
    val se = mgr.acquire()
    assert(se.segments.map(_.dir) == Seq(s"$dir/final"))
    assert(merged.docCount == n - delTargets.size)

    // fresh single-segment build of the logical corpus
    val logical = (0L until n)
      .map(Corpus.page(_))
      .filterNot(p => delTargets.contains(p.url))
      .map(p =>
        if (updTargets.contains(p.url)) (p.url, "zzlifecycle updated content body")
        else (p.url, p.text))
    val freshDir = tmpDir("lifecycle-fresh")
    IndexBuilder.buildSegment(spark.createDataset(logical), freshDir, cfg)
    val fresh = new IndexSearcher(spark, Seq(Manifest.read(freshDir).get))

    assert(se.stats == fresh.stats, "collection stats differ after purge")
    val queries = Seq("court", "court AND law", "court OR law OR state",
      "zzlifecycle", "court^2 OR law", "the AND of")
    for (qs <- queries) {
      val q = Query.parse(qs)
      def ranked(s: IndexSearcher): Seq[(Double, String)] = {
        val hits = s.topK(q, 10).collect()
        val urls = s.docsForIds(hits.map(_.docId).toSeq)
          .select("docId", "url").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        hits.map(h => (h.score, urls(h.docId))).sortBy { case (sc, u) => (-sc, u) }.toSeq
      }
      assert(ranked(se) == ranked(fresh), s"lifecycle != fresh for: $qs")
    }
    // deleted urls are gone; updated urls carry only the new content
    assert(se.count(Query.parse("zzlifecycle")) == 2)
    val urlSet = se.docsTable.select("url").as[String].collect().toSet
    delTargets.foreach(u => assert(!urlSet.contains(u), s"deleted url $u survived merge"))
  }
}
