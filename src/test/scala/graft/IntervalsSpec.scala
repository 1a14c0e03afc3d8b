package graft

import graft.analysis.StandardAnalyzer
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.search.{IndexSearcher, Intervals, Query}
import org.scalatest.funsuite.AnyFunSuite

/** Interval (span) query semantics: fixture algebra checks against
  * hand-computed minimal intervals, and a corpus duel of the indexed
  * evaluator against an independent exhaustive (cartesian) evaluator over
  * re-analyzed stored text.
  */
class IntervalsSpec extends SparkTestBase {

  import Intervals._

  private def ivs(src: Source, pos: Map[String, Array[Int]]): Seq[(Int, Int)] =
    eval(src, t => pos.getOrElse(t, Array.emptyIntArray))
      .map(iv => (startOf(iv), endOf(iv))).toSeq

  test("term / or / maxwidth fixtures") {
    val pos = Map("a" -> Array(1, 5), "b" -> Array(3), "c" -> Array(5))
    assert(ivs(Term("a"), pos) == Seq((1, 1), (5, 5)))
    assert(ivs(Term("zz"), pos) == Seq.empty)
    assert(ivs(Or(Seq(Term("a"), Term("b"))), pos) == Seq((1, 1), (3, 3), (5, 5)))
    // or dedupes the shared position 5
    assert(ivs(Or(Seq(Term("a"), Term("c"))), pos) == Seq((1, 1), (5, 5)))
    assert(ivs(MaxWidth(Unordered(Seq(Term("a"), Term("b"))), 3), pos) == Seq((1, 3), (3, 5)))
  }

  test("unordered: minimal windows, overlaps allowed, minimality enforced") {
    // a@[1,2], b@[3]: window [1,3] contains [2,3] -> only [2,3] is minimal
    val pos = Map("a" -> Array(1, 2), "b" -> Array(3))
    assert(ivs(Unordered(Seq(Term("a"), Term("b"))), pos) == Seq((2, 3)))
    // either order matches
    val pos2 = Map("a" -> Array(7), "b" -> Array(3))
    assert(ivs(Unordered(Seq(Term("a"), Term("b"))), pos2) == Seq((3, 7)))
    // three children: both [1,6] (a@1) and [4,10] (a@10) are minimal —
    // neither contains the other
    val pos3 = Map("a" -> Array(1, 10), "b" -> Array(4), "c" -> Array(6))
    assert(ivs(Unordered(Seq(Term("a"), Term("b"), Term("c"))), pos3) == Seq((1, 6), (4, 10)))
  }

  test("ordered: order required, non-overlapping") {
    val pos = Map("a" -> Array(5), "b" -> Array(3, 8))
    assert(ivs(Ordered(Seq(Term("a"), Term("b"))), pos) == Seq((5, 8)))
    assert(ivs(Ordered(Seq(Term("b"), Term("a"))), pos) == Seq((3, 5)))
    // same position does NOT satisfy ordered (strictly after)
    val pos2 = Map("a" -> Array(4), "b" -> Array(4))
    assert(ivs(Ordered(Seq(Term("a"), Term("b"))), pos2) == Seq.empty)
  }

  test("phrase: contiguity, including over nested sources") {
    val pos = Map("a" -> Array(2, 9), "b" -> Array(3), "c" -> Array(4))
    assert(ivs(Phrase(Seq(Term("a"), Term("b"))), pos) == Seq((2, 3)))
    assert(ivs(Phrase(Seq(Term("a"), Term("b"), Term("c"))), pos) == Seq((2, 4)))
    assert(ivs(Phrase(Seq(Term("b"), Term("a"))), pos) == Seq.empty)
    // phrase of a nested or
    assert(ivs(Phrase(Seq(Or(Seq(Term("a"), Term("c"))), Term("b"))), pos) == Seq((2, 3)))
  }

  test("containing / containedBy") {
    val pos = Map("a" -> Array(1), "b" -> Array(6), "c" -> Array(3))
    val win = Unordered(Seq(Term("a"), Term("b"))) // [1,6]
    assert(ivs(Containing(win, Term("c")), pos) == Seq((1, 6)))
    assert(ivs(Containing(win, Term("zz")), pos) == Seq.empty)
    assert(ivs(ContainedBy(Term("c"), win), pos) == Seq((3, 3)))
    assert(ivs(ContainedBy(Term("b"), Phrase(Seq(Term("a"), Term("c")))), pos) == Seq.empty)
  }

  test("notContaining / notContainedBy / nonOverlapping") {
    val pos = Map("a" -> Array(1, 10), "b" -> Array(6, 14), "c" -> Array(3))
    val win = Unordered(Seq(Term("a"), Term("b"))) // minimal: [1,6], [6,10], [10,14]
    // [1,6] contains c@3; the others don't
    assert(ivs(NotContaining(win, Term("c")), pos) == Seq((6, 10), (10, 14)))
    // absent subtrahend: minuend passes through
    assert(ivs(NotContaining(win, Term("zz")), pos) == Seq((1, 6), (6, 10), (10, 14)))
    // a@1 is inside window [1,6] of unordered(b,c)=[3,6]? no — [3,6] doesn't cover 1;
    // c@3 IS inside [1,6]: not-contained-by drops it
    assert(ivs(NotContainedBy(Term("c"), win), pos) == Seq.empty)
    assert(ivs(NotContainedBy(Term("a"), Unordered(Seq(Term("b"), Term("c")))), pos)
      == Seq((1, 1), (10, 10)))
    // nonOverlapping: windows touching c@3 drop
    assert(ivs(NonOverlapping(win, Term("c")), pos) == Seq((6, 10), (10, 14)))
    assert(ivs(NonOverlapping(Term("b"), win), pos) == Seq.empty) // b inside every window
  }

  test("composition: near(phrase(a,b), c) with width bound") {
    val pos = Map("a" -> Array(10), "b" -> Array(11), "c" -> Array(14, 30))
    val src = MaxWidth(Unordered(Seq(Phrase(Seq(Term("a"), Term("b"))), Term("c"))), 6)
    assert(ivs(src, pos) == Seq((10, 14)))
    val srcTight = MaxWidth(Unordered(Seq(Phrase(Seq(Term("a"), Term("b"))), Term("c"))), 4)
    assert(ivs(srcTight, pos) == Seq.empty)
  }

  // ------------------------------------------------- independent evaluator

  /** Exhaustive cartesian evaluation (independent of the greedy/sweep
    * combiners): enumerate every combination of child intervals, apply the
    * combinator's constraint, minimize per level.
    */
  private def brute(src: Source, pos: Map[String, Array[Int]]): Seq[(Int, Int)] = {
    def minim(l: Seq[(Int, Int)]): Seq[(Int, Int)] =
      l.distinct.filterNot(x => l.distinct.exists(y =>
        y != x && y._1 >= x._1 && y._2 <= x._2)).sorted
    def combos(lists: Seq[Seq[(Int, Int)]]): Seq[Seq[(Int, Int)]] =
      lists.foldLeft(Seq(Seq.empty[(Int, Int)]))((acc, l) =>
        for (c <- acc; iv <- l) yield c :+ iv)
    src match {
      case Term(t) => pos.getOrElse(t, Array.emptyIntArray).map(p => (p, p)).toSeq
      case Or(cs) => minim(cs.flatMap(brute(_, pos)))
      case MaxWidth(c, w) => brute(c, pos).filter(iv => iv._2 - iv._1 + 1 <= w)
      case Phrase(cs) =>
        minim(combos(cs.map(brute(_, pos)))
          .filter(c => c.sliding(2).forall {
            case Seq(x, y) => y._1 == x._2 + 1
            case _ => true
          })
          .map(c => (c.head._1, c.last._2)))
      case Ordered(cs) =>
        minim(combos(cs.map(brute(_, pos)))
          .filter(c => c.sliding(2).forall {
            case Seq(x, y) => y._1 > x._2
            case _ => true
          })
          .map(c => (c.head._1, c.last._2)))
      case Unordered(cs) =>
        minim(combos(cs.map(brute(_, pos)))
          .map(c => (c.map(_._1).min, c.map(_._2).max)))
      case Containing(b, s) =>
        val sv = brute(s, pos)
        brute(b, pos).filter(iv => sv.exists(x => x._1 >= iv._1 && x._2 <= iv._2))
      case ContainedBy(s, b) =>
        val bv = brute(b, pos)
        brute(s, pos).filter(iv => bv.exists(x => iv._1 >= x._1 && iv._2 <= x._2))
      case NotContaining(m, s) =>
        val sv = brute(s, pos)
        brute(m, pos).filterNot(iv => sv.exists(x => x._1 >= iv._1 && x._2 <= iv._2))
      case NotContainedBy(s, b) =>
        val bv = brute(b, pos)
        brute(s, pos).filterNot(iv => bv.exists(x => iv._1 >= x._1 && iv._2 <= x._2))
      case NonOverlapping(m, s) =>
        val sv = brute(s, pos)
        brute(m, pos).filterNot(iv => sv.exists(x => x._1 <= iv._2 && x._2 >= iv._1))
      case Before(s, r) =>
        val rv = brute(r, pos)
        brute(s, pos).filter(iv => rv.exists(x => iv._2 < x._1))
      case After(s, r) =>
        val rv = brute(r, pos)
        brute(s, pos).filter(iv => rv.exists(x => iv._1 > x._2))
      case Overlapping(s, r) =>
        val rv = brute(r, pos)
        brute(s, pos).filter(iv => rv.exists(x => x._1 <= iv._2 && x._2 >= iv._1))
      case NotWithin(m, p, s) =>
        val sv = brute(s, pos)
        brute(m, pos).filterNot(iv =>
          sv.exists(x => x._1 - p <= iv._2 && x._2 + p >= iv._1))
      case Extend(c, b, a) =>
        minim(brute(c, pos).map(iv => (math.max(iv._1 - b, 0), iv._2 + a)))
    }
  }

  test("algebra duel: combiners == exhaustive cartesian on random position maps") {
    val rnd = new scala.util.Random(11)
    val sources = Seq(
      Unordered(Seq(Term("a"), Term("b"))),
      Unordered(Seq(Term("a"), Term("b"), Term("c"))),
      Ordered(Seq(Term("a"), Term("b"))),
      Ordered(Seq(Term("a"), Term("b"), Term("c"))),
      Phrase(Seq(Term("a"), Term("b"))),
      Or(Seq(Term("a"), Phrase(Seq(Term("b"), Term("c"))))),
      MaxWidth(Unordered(Seq(Term("a"), Term("b"))), 4),
      MaxWidth(Ordered(Seq(Term("a"), Or(Seq(Term("b"), Term("c"))))), 6),
      Unordered(Seq(Phrase(Seq(Term("a"), Term("b"))), Term("c"))),
      Containing(Unordered(Seq(Term("a"), Term("b"))), Term("c")),
      ContainedBy(Term("c"), Unordered(Seq(Term("a"), Term("b")))),
      NotContaining(Unordered(Seq(Term("a"), Term("b"))), Term("c")),
      NotContainedBy(Term("c"), Unordered(Seq(Term("a"), Term("b")))),
      NonOverlapping(Unordered(Seq(Term("a"), Term("b"))), Term("c")),
      NonOverlapping(Phrase(Seq(Term("a"), Term("b"))), Unordered(Seq(Term("b"), Term("c")))),
      Before(Term("a"), Term("b")),
      Before(Unordered(Seq(Term("a"), Term("b"))), Term("c")),
      After(Term("a"), Term("b")),
      After(Unordered(Seq(Term("a"), Term("b"))), Term("c")),
      Overlapping(Unordered(Seq(Term("a"), Term("b"))), Term("c")),
      Overlapping(Phrase(Seq(Term("a"), Term("b"))), Unordered(Seq(Term("b"), Term("c")))),
      NotWithin(Term("a"), 2, Term("b")),
      NotWithin(Unordered(Seq(Term("a"), Term("b"))), 1, Term("c")),
      Extend(Term("a"), 1, 2),
      Containing(Extend(Term("a"), 2, 2), Term("b")))
    for (trial <- 0 until 300) {
      val pos = Seq("a", "b", "c").map { t =>
        val n = rnd.nextInt(5)
        t -> Array.fill(n)(rnd.nextInt(20) + 1).distinct.sorted
      }.toMap
      for (src <- sources) {
        val got = ivs(src, pos)
        val expected = brute(src, pos)
        assert(got == expected,
          s"trial $trial src $src pos ${pos.map { case (k, v) => k -> v.toSeq }}: got $got expected $expected")
      }
    }
  }

  // ------------------------------------------------------- indexed duel

  private val NDocs = 800
  private val cfg = IndexConfig(bucketShift = 9, numPostingPartitions = 8,
    numDocPartitions = 4, storePositions = true)
  private lazy val pagesLocal = (0L until NDocs.toLong).map(Corpus.page(_))

  private lazy val se: IndexSearcher = {
    import spark.implicits._
    val dir = tmpDir("ivseg")
    val ds = spark.createDataset(pagesLocal.map(p => (p.url, p.text)))
    IndexBuilder.buildSegment(ds, dir, cfg)
    new IndexSearcher(spark, Seq(Manifest.read(dir).get))
  }

  /** Stored-text evaluation of a source over the whole corpus via the
    * exhaustive evaluator: url -> (count, minWidth).
    */
  private def bruteCorpus(src: Source): Map[String, (Int, Int)] = {
    val an = StandardAnalyzer.Default
    pagesLocal.flatMap { p =>
      val byTerm = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[Int]]()
      an.tokens(p.text).foreach(t =>
        byTerm.getOrElseUpdate(t.term, scala.collection.mutable.ArrayBuffer[Int]()) += t.position)
      val pos = byTerm.map { case (t, b) => t -> b.toArray.sorted }.toMap
      val r = brute(src, pos)
      if (r.isEmpty) None
      else Some(p.url -> (r.size, r.map(iv => iv._2 - iv._1 + 1).min))
    }.toMap
  }

  test("indexed intervals == stored-text exhaustive evaluation on the corpus") {
    import spark.implicits._
    val urlOf = se.docsTable.select($"docId", $"url").as[(Long, String)]
      .collect().toMap
    val sources = Seq(
      MaxWidth(Unordered(Seq(Term("court"), Term("law"))), 8),
      MaxWidth(Ordered(Seq(Term("court"), Term("law"))), 10),
      MaxWidth(Unordered(Seq(Term("court"), Term("law"), Term("state"))), 20),
      MaxWidth(Unordered(Seq(Phrase(Seq(Term("the"), Term("court"))), Term("law"))), 12),
      MaxWidth(Or(Seq(Phrase(Seq(Term("the"), Term("court"))),
        Phrase(Seq(Term("the"), Term("law"))))), 2),
      Containing(MaxWidth(Unordered(Seq(Term("court"), Term("state"))), 15), Term("law")),
      ContainedBy(Term("law"), MaxWidth(Unordered(Seq(Term("court"), Term("state"))), 15)),
      NotContaining(MaxWidth(Unordered(Seq(Term("court"), Term("state"))), 15), Term("law")),
      NotContainedBy(Term("law"), MaxWidth(Unordered(Seq(Term("court"), Term("state"))), 15)),
      NonOverlapping(MaxWidth(Unordered(Seq(Term("court"), Term("law"))), 8),
        Phrase(Seq(Term("the"), Term("state")))))
    for (src <- sources) {
      val indexed = se.intervalHits(src).collect()
        .map { case (d, n, w) => urlOf(d) -> (n, w) }.toMap
      val expected = bruteCorpus(src)
      assert(indexed == expected,
        s"indexed != stored for $src: ${indexed.size} vs ${expected.size} docs")
      assert(expected.nonEmpty, s"vacuous duel for $src — corpus has no matches")
    }
  }

  test("multi-term interval sources: prefix/wildcard/fuzzy expand to OR sources") {
    import spark.implicits._
    val urlOf = se.docsTable.select($"docId", $"url").as[(Long, String)]
      .collect().toMap
    // dictionary-backed expansion == hand-built OR over the same terms
    val pSrc = se.intervalPrefix("cou")
    val expTerms = se.expandPrefix("cou", 128)
    assert(expTerms.nonEmpty)
    val near = MaxWidth(Unordered(Seq(Term("law"), pSrc)), 8)
    val indexed = se.intervalHits(near).collect()
      .map { case (d, n, w) => urlOf(d) -> (n, w) }.toMap
    val handOr =
      if (expTerms.size == 1) Term(expTerms.head) else Or(expTerms.map(Term(_)))
    val expected = bruteCorpus(MaxWidth(Unordered(Seq(Term("law"), handOr)), 8))
    assert(indexed == expected)
    assert(expected.nonEmpty, "vacuous prefix-near duel")
    // wildcard and fuzzy expansions produce consistent sources
    assert(se.intervalWildcard("cou*").terms.toSet == expTerms.toSet)
    assert(se.intervalFuzzy("cuort", maxEdits = 2).terms.contains("court"))
    // unmatched pattern degenerates to a no-match term source
    assert(se.intervalHits(se.intervalPrefix("zzzqx")).collect().isEmpty)
  }

  test("intervals compose with boolean filters at the document level") {
    import spark.implicits._
    val src = MaxWidth(Unordered(Seq(Term("court"), Term("law"))), 10)
    val all = se.intervalHits(src).collect().map(_._1).toSet
    val filt = Query.parse("state")
    val expected = all.intersect(se.matching(filt).collect().toSet)
    val got = se.intervalHitsFiltered(src, filt).collect().map(_._1).toSet
    assert(got == expected)
    assert(expected.nonEmpty && expected != all, "filter should prune some but not all")
  }
}
