package graft

import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig, Manifest, SegmentMerger}
import graft.search.{IndexSearcher, MltParams, MoreLikeThis}

/** Stored per-doc term vectors (ref `index/TermVectors.java` /
  * `codecs/lucene90/Lucene90TermVectorsFormat`): the persisted vector must
  * equal the analyzer's term-frequency map, survive a merge (docID remap +
  * tombstone purge), and feed MoreLikeThis identically to the re-analysis
  * path.
  */
class TermVectorsSpec extends SparkTestBase {

  private val cfg = IndexConfig(bucketShift = 4, numPostingPartitions = 4,
    numDocPartitions = 2, storeTermVectors = true)

  private def corpus(n: Int, off: Int = 0): Seq[(String, String)] =
    (0 until n).map { i =>
      val k = i + off
      val words = (0 to k % 5).flatMap(j => Seq.fill(j % 3 + 1)(s"w${(k + j) % 7}"))
      (f"u$k%04d", ("alpha" +: words).mkString(" "))
    }

  private def tfOf(se: IndexSearcher, docId: Long): Map[String, Int] =
    se.termVectors(Seq(docId)).collect()
      .map(r => r.getString(1) -> r.getInt(2)).toMap

  test("stored vector == analyzer term-frequency map, per doc") {
    import spark.implicits._
    val dir = tmpDir("tv1")
    IndexBuilder.buildSegment(spark.createDataset(corpus(30)), s"$dir/seg", cfg)
    val se = new IndexSearcher(spark, Seq(Manifest.read(s"$dir/seg").get))
    assert(se.hasTermVectors)
    val urls = se.docsTable.select($"docId", $"url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val texts = corpus(30).toMap
    for (docId <- urls.keys) {
      val expect = cfg.analyzer.tokens(texts(urls(docId))).map(_.term)
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(tfOf(se, docId) == expect, s"docId=$docId")
    }
  }

  test("batch lookup explodes only the requested ids") {
    import spark.implicits._
    val dir = tmpDir("tv2")
    IndexBuilder.buildSegment(spark.createDataset(corpus(20)), s"$dir/seg", cfg)
    val se = new IndexSearcher(spark, Seq(Manifest.read(s"$dir/seg").get))
    val got = se.termVectors(Seq(0L, 3L, 7L)).select($"docId").distinct()
      .as[Long].collect().toSet
    assert(got == Set(0L, 3L, 7L))
    assert(se.termVectors(Seq.empty).count() == 0)
  }

  test("vectors survive merge: docID remap + tombstone purge") {
    import spark.implicits._
    val d1 = tmpDir("tv3a"); val d2 = tmpDir("tv3b"); val out = tmpDir("tv3m")
    IndexBuilder.buildSegment(spark.createDataset(corpus(10)), s"$d1/seg", cfg)
    IndexBuilder.buildSegment(spark.createDataset(corpus(10, off = 10)), s"$d2/seg", cfg)
    // delete one doc from the first segment before merging
    val deadUrl = "u0003"
    graft.index.Deletes.deleteByUrls(spark, s"$d1/seg", Seq(deadUrl))
    val m = SegmentMerger.merge(spark, Seq(s"$d1/seg", s"$d2/seg"), s"$out/seg", cfg)
    val se = new IndexSearcher(spark, Seq(m))
    assert(se.hasTermVectors)
    val urls = se.docsTable.select($"docId", $"url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!urls.values.toSet.contains(deadUrl))
    val texts = (corpus(10) ++ corpus(10, off = 10)).toMap
    for (docId <- urls.keys) {
      val expect = cfg.analyzer.tokens(texts(urls(docId))).map(_.term)
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(tfOf(se, docId) == expect, s"post-merge docId=$docId")
    }
    // purged doc has no vector row
    val all = spark.read.parquet(s"$out/seg/tvec").count()
    assert(all == 19)
  }

  test("mixed inputs (one segment without vectors) drop tvec on merge") {
    import spark.implicits._
    val d1 = tmpDir("tv4a"); val d2 = tmpDir("tv4b"); val out = tmpDir("tv4m")
    IndexBuilder.buildSegment(spark.createDataset(corpus(6)), s"$d1/seg", cfg)
    IndexBuilder.buildSegment(spark.createDataset(corpus(6, off = 6)), s"$d2/seg",
      cfg.copy(storeTermVectors = false))
    SegmentMerger.merge(spark, Seq(s"$d1/seg", s"$d2/seg"), s"$out/seg", cfg)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/seg/tvec")))
  }

  test("MoreLikeThis: term-vector path == re-analysis path") {
    import spark.implicits._
    val dir = tmpDir("tv5")
    IndexBuilder.buildSegment(spark.createDataset(corpus(40)), s"$dir/seg", cfg)
    val se = new IndexSearcher(spark, Seq(Manifest.read(s"$dir/seg").get))
    val texts = corpus(40).toMap
    val p = MltParams(minTermFreq = 1, minDocFreq = 2, maxQueryTerms = 6,
      boostTerms = true)
    for (docId <- Seq(0L, 11L, 25L)) {
      val url = se.docsTable.where($"docId" === docId).select($"url").as[String].head()
      val viaText = MoreLikeThis.interestingTerms(se, texts(url), p)
      val viaVec = MoreLikeThis.interestingTermsFromVector(se, docId, p)
      assert(viaVec == viaText, s"docId=$docId")
      // queryForDoc prefers the vector arm and never touches fallbackText
      val q = MoreLikeThis.queryForDoc(se, docId,
        sys.error("fallback must not evaluate"), p)
      assert(q == MoreLikeThis.query(se, texts(url), p))
    }
  }
}
