package graft

import graft.corpus.Corpus
import graft.index.{Deletes, IndexBuilder, IndexConfig, LiveSet, Replicator, SegmentMerger}
import graft.search.{IndexSearcher, Query}

/** Incremental replication (ref lucene/replicator ReplicationClient +
  * IndexRevision): sync copies only files the replica lacks, publishes the
  * revision atomically, resumes after torn copies, and GCs segments that
  * fall out of the replicated live set — with full rank identity between
  * source and replica after every cycle.
  */
class ReplicatorSpec extends SparkTestBase {

  private val cfg =
    IndexConfig(bucketShift = 10, numPostingPartitions = 4, numDocPartitions = 2)

  private def buildSeg(dir: String, name: String, start: Long, n: Long): Unit = {
    import spark.implicits._
    val pages = Corpus.pages(spark, n, start = start).map(p => (p.url, p.text))
    IndexBuilder.buildSegment(pages, s"$dir/$name", cfg)
    ()
  }

  /** Complete (url, 6-dp score) ranking — the identity probe. */
  private def ranking(dir: String, q: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    val se = IndexSearcher.open(spark, dir)
    se.topK(Query.parse(q), 100000).toDF()
      .join(se.docsTable.select(col("docId"), col("url")), "docId")
      .select(col("url"), round(col("score"), 6).as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(identity).toSeq
  }

  test("sync replicates commit points incrementally with rank identity") {
    val src = tmpDir("repl-src")
    val dst = tmpDir("repl-dst")
    buildSeg(src, "seg00", 0, 400)
    LiveSet.add(src, Seq("seg00"))

    // first cycle: full copy, replica is a self-contained openable index
    val r1 = Replicator.sync(src, dst)
    assert(r1.segments == Seq("seg00"))
    assert(r1.filesCopied > 0 && r1.filesSkipped == 0)
    assert(IndexSearcher.open(spark, dst).stats.docCount == 400)
    assert(ranking(dst, "court") == ranking(src, "court"))

    // no-op re-sync: nothing to copy, every file recognized as present
    val r1b = Replicator.sync(src, dst)
    assert(r1b.filesCopied == 0 && r1b.filesSkipped == r1.filesCopied)

    // incremental cycle: a new segment at the source plus a tombstone
    // generation ADDED inside the old one (deletes never rewrite files)
    buildSeg(src, "seg01", 400, 200)
    LiveSet.add(src, Seq("seg01"))
    val victims = Seq(3L, 5L).map(Corpus.page(_).url)
    assert(Deletes.deleteByUrls(spark, s"$src/seg00", victims) == 2)
    val r2 = Replicator.sync(src, dst)
    assert(r2.segments == Seq("seg00", "seg01"))
    assert(r2.filesSkipped == r1.filesCopied,
      "seg00's immutable payload files must not be re-copied")
    assert(r2.filesCopied > 0, "seg01 + seg00's new tombstone generation")
    assert(ranking(dst, "court") == ranking(src, "court"))
    val delUrl = victims.head
    assert(ranking(dst, "court").forall(_._1 != delUrl) ||
      !Corpus.page(3L).text.contains("court"))

    // torn-copy resume: lose one replica file, re-sync restores exactly it
    val seg01Files = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dst/seg01")).filter(_.getName.endsWith(".parquet"))
    }
    assert(seg01Files.nonEmpty)
    assert(seg01Files.head.delete())
    val r2b = Replicator.sync(src, dst)
    assert(r2b.filesCopied == 1, s"resume should copy exactly the lost file, got ${r2b.filesCopied}")
    assert(ranking(dst, "court") == ranking(src, "court"))

    // merge at the source: replica publishes the merged revision, then GCs
    // the inputs that dropped out of the live set (old-revision cleanup)
    val inputs = LiveSet.manifests(src).map(_.dir)
    SegmentMerger.merge(spark, inputs, s"$src/merge00", cfg)
    LiveSet.swap(src, Seq("seg00", "seg01"), Seq("merge00"))
    LiveSet.gcOrphans(src)
    val r3 = Replicator.sync(src, dst)
    assert(r3.segments == Seq("merge00"))
    assert(r3.orphansRemoved.sorted == Seq("seg00", "seg01"))
    assert(!new java.io.File(s"$dst/seg00").exists)
    assert(ranking(dst, "court") == ranking(src, "court"))
    assert(IndexSearcher.open(spark, dst).stats.docCount ==
      IndexSearcher.open(spark, src).stats.docCount)
  }
}
