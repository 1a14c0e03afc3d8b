package graft

import graft.index.{IndexBuilder, IndexConfig, Manifest, SegmentMerger}
import graft.pipeline.TextOps
import graft.search._

/** Offset postings (IndexConfig.storeOffsets) + the offset-based
  * highlighter (ref index/IndexOptions.java ..._AND_OFFSETS,
  * uhighlight/UnifiedHighlighter.java OffsetSource.POSTINGS).
  */
class OffsetsSpec extends SparkTestBase {

  private def build(dir: String, pages: Seq[(String, String)],
      stopwords: Set[String] = Set.empty): IndexSearcher = {
    import spark.implicits._
    val cfg = IndexConfig(bucketShift = 4, numPostingPartitions = 2,
      numDocPartitions = 2, storePositions = true, storeOffsets = true,
      stopwords = stopwords)
    IndexBuilder.buildSegment(pages.toDF("url", "text").as[(String, String)],
      dir, cfg)
    new IndexSearcher(spark, Seq(Manifest.read(dir).get))
  }

  test("offsets are exact source spans, even where re-analysis mangles") {
    // stopword removal shifts token indices vs raw word positions: a
    // token-index window over the stored text would mis-place the hit;
    // the offset postings carry the exact original character spans
    val pages = Seq(
      ("d0", "the data of the stream"), // 'data' tokens at index 0 post-stop
      ("d1", "data at the start"),
      ("d2", "ends with data"))
    val se = build(tmpDir("offs-stop") + "/seg", pages,
      stopwords = Set("the", "of", "at", "with"))
    val docs = se.docsTable.select("docId", "url").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val texts = pages.toMap
    val offs = se.offsetsForDocs("data", docs.values.toSeq)
    assert(offs.keySet == docs.values.toSet)
    for ((url, id) <- docs) {
      val o = offs(id)
      assert(o.length == 2, s"$url: expected one (start,end) pair")
      assert(texts(url).substring(o(0), o(1)) == "data",
        s"$url: span (${o(0)},${o(1)}) is not the hit term")
    }
  }

  test("snippetByOffset == token-window snippet, including edge shifts") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta data gamma delta epsilon", // interior hit
      "data beta gamma delta",               // left edge: window shifts right
      "alpha data gamma",                    // p=2: one word left, three right
      "alpha beta gamma data",               // right edge: clipped
      "data")                                // singleton
    for (t <- texts) {
      val start = t.indexOf("data")
      val viaOffsets = TextOps.snippetByOffset(t, start, start + 4, 2)
      val viaTokens = Seq(t).toDF("text")
        .select(TextOps.snippet(org.apache.spark.sql.functions.col("text"), "data", 2))
        .head().getString(0)
      assert(viaOffsets == viaTokens, s"'$t': offsets '$viaOffsets' != tokens '$viaTokens'")
    }
  }

  test("offsets survive a segment merge (purge + compact round trip)") {
    import spark.implicits._
    val mkPages = (o: Int) => (0 until 40).map(i =>
      (f"u$o%d_$i%03d", s"w${i % 7} data w${(i + o) % 5} filler end"))
    val base = tmpDir("offs-merge")
    val cfg = IndexConfig(bucketShift = 4, numPostingPartitions = 2,
      numDocPartitions = 2, storePositions = true, storeOffsets = true)
    val m1 = IndexBuilder.buildSegment(
      mkPages(0).toDF("url", "text").as[(String, String)], s"$base/s1", cfg)
    val m2 = IndexBuilder.buildSegment(
      mkPages(1).toDF("url", "text").as[(String, String)], s"$base/s2", cfg)
    assert(m1.hasOffsets && m2.hasOffsets)
    SegmentMerger.merge(spark, Seq(s"$base/s1", s"$base/s2"), s"$base/merged", cfg)
    val mm = Manifest.read(s"$base/merged").get
    assert(mm.hasOffsets, "merged manifest dropped hasOffsets")
    val report = graft.index.CheckIndex.check(spark, s"$base/merged")
    assert(report.ok, s"CheckIndex on merged offsets segment: ${report.violations}")
    val se = new IndexSearcher(spark, Seq(mm))
    val ids = se.docsTable.select("docId").as[Long].collect().toSeq
    val offs = se.offsetsForDocs("data", ids)
    assert(offs.size == ids.size, "a merged doc lost its offsets")
    // every doc's 'data' span decodes to chars 3..7 of its text shape
    offs.values.foreach(o => assert(o.length == 2 && o(1) - o(0) == 4))
  }
}
