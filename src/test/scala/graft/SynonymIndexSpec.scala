package graft

import graft.analysis.{StandardAnalyzer, SynonymInjector, SynonymRule, Token}
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.search._

/** Index-time synonym graphs (ref analysis/synonym/SynonymGraphFilter.java):
  * injector semantics, norm discounting, positional stacking.
  */
class SynonymIndexSpec extends SparkTestBase {

  private val an = StandardAnalyzer.Default

  private def inj(rules: (List[String], String)*) =
    new SynonymInjector(rules.map { case (v, o) => SynonymRule(v, o) })

  test("injector: single- and multi-token rules at position-increment 0") {
    val toks = an.tokens("big apple pie")
    val out = inj(List("big", "apple") -> "nyc", List("pie") -> "dessert")
      .injected(toks)
    assert(out == Vector(
      Token("nyc", 0, 0, 9),       // spans 'big apple', stacked at position 0
      Token("dessert", 2, 10, 13)))
  }

  test("injector: a stopword's position gap blocks a phrase match") {
    val stopAn = new StandardAnalyzer(stopwords = Set("the"))
    val gapped = stopAn.tokens("data the stream") // positions 0, 2
    assert(inj(List("data", "stream") -> "ds").injected(gapped).isEmpty)
    val adjacent = stopAn.tokens("data stream")
    assert(inj(List("data", "stream") -> "ds").injected(adjacent)
      == Vector(Token("ds", 0, 0, 11)))
  }

  test("injector: overlapping and repeated matches all inject") {
    val toks = an.tokens("a b a b")
    val out = inj(List("a", "b") -> "ab").injected(toks)
    assert(out.map(_.position) == Vector(0, 2))
  }

  test("synonym index: canonical query finds variant-only docs; norms discount overlaps") {
    import spark.implicits._
    val pages = Seq(
      ("d0", "data stream processing engine"),
      ("d1", "vector search index"),
      ("d2", "plain text nothing here"),
      ("d3", "data stream data stream twice"),
      ("d4", "datastream appears literally")).toDF("url", "text").as[(String, String)]
    val dir = tmpDir("synidx")
    val rules = Seq(List("data", "stream") -> "datastream", List("vector") -> "embedding")
    val cfg = IndexConfig(bucketShift = 4, numPostingPartitions = 2,
      numDocPartitions = 2, storePositions = true, synonyms = rules)
    IndexBuilder.buildSegment(pages, s"$dir/seg", cfg)
    val se = new IndexSearcher(spark, Seq(Manifest.read(s"$dir/seg").get))

    // canonical single term finds the variant docs
    assert(se.matchingCached(TermQuery("embedding")).collect().toSet == Set(1L))
    val ds = se.topK(TermQuery("datastream"), 10).collect()
    assert(ds.map(_.docId).toSet == Set(0L, 3L, 4L))
    // tf counts injections: d3 has two matches
    val e3 = se.explain(TermQuery("datastream"), 3L)
    assert(e3.matched)

    // norms exclude the injected tokens: same norm bytes as a plain build
    val plain = tmpDir("synidx-plain")
    IndexBuilder.buildSegment(pages, s"$plain/seg", cfg.copy(synonyms = Seq.empty))
    val normsSyn = spark.read.parquet(s"$dir/seg/docs")
      .select("docId", "norm").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val normsPlain = spark.read.parquet(s"$plain/seg/docs")
      .select("docId", "norm").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(normsSyn == normsPlain, "injected tokens leaked into norms")

    // sttf includes the injections (Lucene SumTotalTermFreq semantics)
    val mSyn = Manifest.read(s"$dir/seg").get
    val mPlain = Manifest.read(s"$plain/seg").get
    assert(mSyn.sumTotalTermFreq == mPlain.sumTotalTermFreq + 3 + 1,
      s"sttf ${mSyn.sumTotalTermFreq} vs plain ${mPlain.sumTotalTermFreq}")

    // the injected token is positional: a phrase crossing it matches
    // ("datastream processing" — injected at position 0, 'processing' at 2?
    //  no: 'data stream processing' positions 0,1,2; datastream stacks at 0,
    //  so phrase (datastream, +2 processing) needs slop; exact phrase with
    //  the NEXT token after the match start is (datastream@0, stream@1))
    val hits = se.topK(PhraseQuery(Seq("datastream", "stream")), 10).collect()
    assert(hits.map(_.docId).toSet == Set(0L, 3L),
      "stacked position did not support phrase matching")

    // CheckIndex invariants hold on a synonym segment
    val report = graft.index.CheckIndex.check(spark, s"$dir/seg")
    assert(report.ok, s"CheckIndex: ${report.violations}")
  }
}
