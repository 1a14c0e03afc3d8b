package graft

import graft.analysis.{EnglishMinimalStemmer, StandardAnalyzer}
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.search.{IndexSearcher, Precision}

/** End-to-end stemming-analyzer index: build + query through the `minimal`
  * filter conflates morphological variants into one posting (ref
  * `analysis/common/.../en/EnglishMinimalStemFilter.java` wired as the
  * analyzer chain of an index).
  */
class StemIndexSpec extends SparkTestBase {

  private lazy val searcher: IndexSearcher = {
    import spark.implicits._
    val dir = tmpDir("stemseg")
    val pages = Seq(
      "doc0" -> "query speed",
      "doc1" -> "queries run often",
      "doc2" -> "querys tables",
      "doc3" -> "table of contents",
      "doc4" -> "nothing relevant here"
    )
    val cfg = IndexConfig(bucketShift = 9, numPostingPartitions = 4,
      numDocPartitions = 2, termFilter = "minimal")
    IndexBuilder.buildSegment(spark.createDataset(pages), dir, cfg)
    new IndexSearcher(spark, Seq(Manifest.read(dir).get),
      analyzer = new StandardAnalyzer(filter = EnglishMinimalStemmer),
      precision = Precision.DoubleOracle)
  }

  test("variants conflate at build time: one posting, summed stats") {
    val ts = searcher.termStats(Seq("query", "queries", "querys", "table"))
    assert(ts.get("query").map(_.docFreq).getOrElse(0L) == 3L)
    // raw variants are NOT in the dictionary — they were rewritten
    assert(ts.get("queries").isEmpty)
    assert(ts.get("querys").isEmpty)
    // 'tables' in doc2 + 'table' in doc3
    assert(ts.get("table").map(_.docFreq).getOrElse(0L) == 2L)
  }

  test("query-side stemming finds docs with any variant") {
    val hits = searcher.topK(searcher.parse("queries"), 10).collect()
    assert(hits.map(_.docId).sorted.toSeq == Seq(0L, 1L, 2L))
    val and = searcher.topK(searcher.parse("querys AND tables"), 10).collect()
    assert(and.map(_.docId).toSeq == Seq(2L))
  }

  test("unstemmed index does not conflate (control)") {
    import spark.implicits._
    val dir = tmpDir("rawseg")
    val pages = Seq("doc0" -> "query speed", "doc1" -> "queries run")
    IndexBuilder.buildSegment(spark.createDataset(pages), dir,
      IndexConfig(bucketShift = 9, numPostingPartitions = 4, numDocPartitions = 2))
    val raw = new IndexSearcher(spark, Seq(Manifest.read(dir).get),
      precision = Precision.DoubleOracle)
    assert(raw.termStats(Seq("query")).get("query").map(_.docFreq).getOrElse(0L) == 1L)
    assert(raw.termStats(Seq("queries")).get("queries").map(_.docFreq).getOrElse(0L) == 1L)
  }
}
