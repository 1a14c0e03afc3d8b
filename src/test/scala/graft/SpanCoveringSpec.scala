package graft

import org.apache.spark.sql.functions._

import graft.analysis.Phonetic
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{BoolQuery, IndexSearcher, MatchNoneQuery, Occur, Query, TermQuery}

/** Round-4 second-wave query operators: SpanPositionRange matching,
  * CoveringQuery (per-doc minimumNumberMatch), CommonTermsQuery's
  * docFreq-driven split, and the Soundex phonetic chain.
  */
class SpanCoveringSpec extends SparkTestBase {

  private val cfg = IndexConfig(bucketShift = 4, numPostingPartitions = 4,
    numDocPartitions = 2, storePositions = true)

  private lazy val corpus = Seq(
    ("u1", "a b a c a b d a"),
    ("u2", "b a a a"),
    ("u3", "c d b"),
    ("u4", "a c a c a"),
    ("u5", "d b c a b"))

  private lazy val se: IndexSearcher = {
    import spark.implicits._
    val dir = tmpDir("spancov")
    IndexBuilder.buildSegment(spark.createDataset(corpus), dir, cfg)
    new IndexSearcher(spark, Seq(graft.index.Manifest.read(dir).get))
  }

  private lazy val urlOf: Map[Long, String] = {
    import spark.implicits._
    se.docsTable.select($"docId", $"url").as[(Long, String)].collect().toMap
  }

  test("spanRangeFreqs == brute-force position count for every (start,end)") {
    val positions: Map[String, Seq[Int]] = corpus.map { case (u, text) =>
      u -> text.split(" ").zipWithIndex.collect { case ("a", i) => i }.toSeq
    }.toMap
    for (start <- 0 to 5; end <- start to 8) {
      val got = se.spanRangeFreqs("a", start, end).collect()
        .map { case (id, c) => urlOf(id) -> c }.toMap
      val want = positions.collect {
        case (u, ps) if ps.count(p => p >= start && p + 1 <= end) > 0 =>
          u -> ps.count(p => p >= start && p + 1 <= end)
      }
      assert(got == want, s"start=$start end=$end")
    }
    // spanFirst is the start=0 case
    val first = se.spanFirstFreqs("a", 3).collect().toMap
    assert(first == se.spanRangeFreqs("a", 0, 3).collect().toMap)
  }

  test("coveringMatches == brute per-doc minimumNumberMatch over scored clauses") {
    import spark.implicits._
    val clauses = Seq("a", "b", "c").map(t => TermQuery(t): Query)
    // per-doc minimum = (last char of url as digit) % 2 + 1, from docsTable
    val minM = substring($"url", 2, 1).cast("int") % 2 + 1
    val got = se.coveringMatches(clauses, minM).collect()
      .map(r => (urlOf(r.getLong(0)), r.getDouble(1), r.getLong(2))).toList
      .sortBy(_._1)
    val perClause: Map[String, Map[String, Double]] = clauses.map { q =>
      q.terms.head -> se.scoreMatches(q).collect()
        .map(h => urlOf(h.docId) -> h.score).toMap
    }.toMap
    val want = corpus.map(_._1).flatMap { u =>
      val matched = perClause.values.flatMap(_.get(u)).toList
      val min = u.substring(1).toInt % 2 + 1
      if (matched.size >= min) Some((u, matched.sum, matched.size.toLong)) else None
    }.sortBy(_._1)
    assert(got.map(t => (t._1, t._3)) == want.map(t => (t._1, t._3)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._2 - w._2) < 1e-9) }
    // topK cut respects (rounded score desc, docId) order
    val top2 = se.coveringTopK(clauses, minM, 2).collect()
    assert(top2.length == math.min(2, want.size))
  }

  test("commonTermsQuery: df split requires the rare term, common terms score-only") {
    // 'a' in 4/5 docs (0.8 > 0.65 -> common), 'd' in 3/5 (0.6 <= 0.65 -> rare)
    val q = se.commonTermsQuery(Seq("a", "d"), maxTermFrequency = 0.65)
    q match {
      case BoolQuery(clauses, _) =>
        assert(clauses.map(_._2) == Seq(Occur.Must, Occur.Should))
        val mustTerms = clauses.head._1.terms
        assert(mustTerms == Set("d"), s"required group was $mustTerms")
        assert(clauses(1)._1.terms == Set("a"))
      case other => fail(s"expected outer BoolQuery, got $other")
    }
    val matched = se.matching(q).collect().map(urlOf).toSet
    assert(matched == Set("u1", "u3", "u5")) // docs containing rare 'd'
    // score == sum over matched terms (duel vs plain OR restricted to d-docs)
    val orScores = se.scoreMatches(Query.or("a", "d")).collect()
      .map(h => urlOf(h.docId) -> h.score).toMap
    se.scoreMatches(q).collect().foreach { h =>
      assert(math.abs(h.score - orScores(urlOf(h.docId))) < 1e-9)
    }
    // all-common and all-rare degenerate cases
    assert(se.commonTermsQuery(Seq("a", "b"), 0.5).isInstanceOf[BoolQuery])
    assert(se.commonTermsQuery(Seq("zzz"), 0.5) != MatchNoneQuery) // unknown term is "rare"
    assert(se.commonTermsQuery(Seq.empty, 0.5) == MatchNoneQuery)
  }

  test("Soundex chain matches the classic fixtures (incl. the H/W collapse rule)") {
    import spark.implicits._
    val fixtures = Seq(
      "robert" -> "R163", "rupert" -> "R163", "ashcraft" -> "A261",
      "ashcroft" -> "A261", "tymczak" -> "T522", "pfister" -> "P236",
      "honeyman" -> "H555", "smith" -> "S530", "smyth" -> "S530",
      "stream" -> "S365", "stram" -> "S365", "query" -> "Q600",
      "a" -> "A000")
    val got = fixtures.map(_._1).toDF("w")
      .select($"w", Phonetic.soundex($"w").as("c")).as[(String, String)]
      .collect().toMap
    fixtures.foreach { case (w, c) => assert(got(w) == c, s"soundex($w)") }
  }

  test("phoneticSuggest finds sound-alike dictionary terms ranked by docFreq") {
    import spark.implicits._
    val dir = tmpDir("phon")
    val docs = Seq(("u1", "stream stream smith"), ("u2", "stream smyth"),
      ("u3", "strem query"))
    IndexBuilder.buildSegment(spark.createDataset(docs), dir, cfg)
    val se2 = new IndexSearcher(spark, Seq(graft.index.Manifest.read(dir).get))
    val got = se2.phoneticSuggest("stram", 5).as[(String, Long)].collect().toList
    assert(got == List(("stream", 2L), ("strem", 1L))) // df order, S365 group
    val smiths = se2.phoneticSuggest("smyth", 5).as[(String, Long)].collect().toList
    assert(smiths == List(("smith", 1L), ("smyth", 1L))) // df tie -> term asc
  }
}
