package graft

import graft.analysis.StandardAnalyzer
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.search._

/** MoreLikeThis term selection + generated-query duels (ref
  * `queries/mlt/MoreLikeThis.java`): frequency gates, ClassicSimilarity idf
  * ranking, maxQueryTerms cut, boostTerms weighting, seed-doc exclusion.
  */
class MoreLikeThisSpec extends SparkTestBase {

  private val NDocs = 600
  private val cfg = IndexConfig(bucketShift = 9, numPostingPartitions = 4, numDocPartitions = 2)
  private lazy val pagesLocal = (0L until NDocs.toLong).map(Corpus.page(_))
  private lazy val oracle = new BruteForceOracle(pagesLocal, StandardAnalyzer.Default)

  private lazy val segDir: String = {
    import spark.implicits._
    val dir = tmpDir("mltseg")
    val ds = spark.createDataset(pagesLocal.map(p => (p.url, p.text)))
    IndexBuilder.buildSegment(ds, dir, cfg)
    dir
  }

  private lazy val searcher: IndexSearcher =
    new IndexSearcher(spark, Seq(Manifest.read(segDir).get))

  private def srcText = pagesLocal.head.text

  test("interestingTerms respects tf/df gates, ranking and the cut") {
    val p = MltParams(minTermFreq = 2, minDocFreq = 5, maxQueryTerms = 6)
    val sel = MoreLikeThis.interestingTerms(searcher, srcText, p)
    assert(sel.nonEmpty && sel.size <= p.maxQueryTerms)
    val tf = StandardAnalyzer.Default.tokens(srcText).map(_.term)
      .groupBy(identity).view.mapValues(_.size).toMap
    val n = oracle.docCount.toDouble
    sel.foreach { case (t, w) =>
      assert(tf(t) >= p.minTermFreq, s"tf gate: $t")
      val df = oracle.docFreq(t)
      assert(df >= p.minDocFreq, s"df gate: $t")
      val expected = BigDecimal(tf(t) * (math.log((n + 1d) / (df + 1d)) + 1d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(w == expected, s"selection weight: $t")
    }
    // best-first, deterministic tie-break (score desc, term asc)
    assert(sel == sel.sortBy { case (t, s) => (-s, t) })
    // the cut keeps the TOP terms: every excluded candidate ranks below
    val all = MoreLikeThis.interestingTerms(searcher, srcText, p.copy(maxQueryTerms = Int.MaxValue))
    assert(all.take(p.maxQueryTerms) == sel)
  }

  test("word-length bounds filter candidates") {
    val p = MltParams(minTermFreq = 1, minDocFreq = 1, maxQueryTerms = 100,
      minWordLen = 3, maxWordLen = 6)
    val sel = MoreLikeThis.interestingTerms(searcher, srcText, p)
    assert(sel.nonEmpty)
    assert(sel.forall { case (t, _) => t.length >= 3 && t.length <= 6 })
  }

  test("maxDocFreq excludes head terms") {
    val loose = MoreLikeThis.interestingTerms(searcher, srcText,
      MltParams(minTermFreq = 1, minDocFreq = 1, maxQueryTerms = Int.MaxValue))
    val cap = loose.map { case (t, _) => oracle.docFreq(t) }.max - 1
    val sel = MoreLikeThis.interestingTerms(searcher, srcText,
      MltParams(minTermFreq = 1, minDocFreq = 1, maxDocFreq = cap, maxQueryTerms = Int.MaxValue))
    assert(sel.nonEmpty)
    assert(sel.forall { case (t, _) => oracle.docFreq(t) <= cap })
    assert(sel.size < loose.size)
  }

  test("unboosted query equals a plain OR of the selected terms") {
    val p = MltParams(minTermFreq = 2, minDocFreq = 5, maxQueryTerms = 5)
    val q = MoreLikeThis.query(searcher, srcText, p)
    val sel = MoreLikeThis.interestingTerms(searcher, srcText, p)
    assert(q == Query.or(sel.map(_._1): _*))
  }

  test("boosted query duels the brute-force oracle (rank + score identity)") {
    val p = MltParams(minTermFreq = 2, minDocFreq = 5, maxQueryTerms = 6,
      boostTerms = true)
    val q = MoreLikeThis.query(searcher, srcText, p)
    val hits = searcher.topK(q, 20).collect().sortBy(h => (-h.score, h.docId))
    val expect = oracle.topK(q, 20)
    assert(hits.length == expect.length)
    hits.zip(expect).foreach { case (h, (d, s)) =>
      assert(h.docId == d, s"rank order at doc ${h.docId}")
      assert(math.abs(h.score - s) < 1e-9, s"score at doc $d: ${h.score} vs $s")
    }
    // boosts are relative to the best term: first clause weight 1.0
    q match {
      case BoolQuery(cs, _) =>
        val boosts = cs.map {
          case (BoostQuery(_, b), _) => b
          case _                     => 1.0
        }
        assert(math.abs(boosts.max - 1.0) < 1e-12)
        assert(boosts.exists(_ < 1.0)) // gates picked terms of unequal weight
      case other => fail(s"expected BoolQuery, got $other")
    }
  }

  test("empty selection folds to MatchNoneQuery; likeDoc excludes the seed") {
    assert(MoreLikeThis.query(searcher, "zzzznothere qqqqabsent",
      MltParams(minTermFreq = 1, minDocFreq = 1)) == MatchNoneQuery)
    assert(MoreLikeThis.query(searcher, "", MltParams()) == MatchNoneQuery)

    val p = MltParams(minTermFreq = 2, minDocFreq = 5, maxQueryTerms = 6)
    val seed = oracle.topK(MoreLikeThis.query(searcher, srcText, p), 1).head._1
    val like = MoreLikeThis.likeDoc(searcher, srcText, seed, 10, p).collect()
    assert(like.length == 10)
    assert(!like.exists(_.docId == seed))
    // the k results are the oracle's top-k with the seed removed
    val exp = oracle.topK(MoreLikeThis.query(searcher, srcText, p), 11)
      .filter(_._1 != seed).take(10).map(_._1)
    assert(like.map(_.docId).toSeq == exp)
  }
}
