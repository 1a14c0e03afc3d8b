package graft

import graft.search.{Intervals, TermAutomaton}

/** TermAutomatonQuery compilation: path enumeration over the NFA, ANY
  * folding into position gaps, structural guards (cycles, leading/trailing
  * ANY, path caps), and interval-level matching fixtures.
  */
class TermAutomatonSpec extends SparkTestBase {

  import Intervals._

  private def ivs(src: Source, pos: Map[String, Array[Int]]): Seq[(Int, Int)] =
    eval(src, t => pos.getOrElse(t, Array.emptyIntArray))
      .map(iv => (startOf(iv), endOf(iv))).toSeq

  private def diamond(): TermAutomaton = {
    // accepts "a b" and "a ANY b"
    val ta = new TermAutomaton
    val s1 = ta.createState(); val s2 = ta.createState(); val s3 = ta.createState()
    ta.addTransition(0, s1, "a")
    ta.addTransition(s1, s3, "b")
    ta.addAnyTransition(s1, s2)
    ta.addTransition(s2, s3, "b")
    ta.setAccept(s3)
    ta
  }

  test("path enumeration: diamond shapes, dedup, multiple accept states") {
    val ta = diamond()
    assert(ta.paths() == Seq(
      Seq(Some("a"), Some("b")),
      Seq(Some("a"), None, Some("b"))))

    // an intermediate accept state yields the prefix path too
    val ta2 = new TermAutomaton
    val s1 = ta2.createState(); val s2 = ta2.createState()
    ta2.addTransition(0, s1, "x")
    ta2.addTransition(s1, s2, "y")
    ta2.setAccept(s1); ta2.setAccept(s2)
    assert(ta2.paths() == Seq(Seq(Some("x")), Seq(Some("x"), Some("y"))))

    // duplicate label paths through different states dedupe
    val ta3 = new TermAutomaton
    val a1 = ta3.createState(); val a2 = ta3.createState(); val end = ta3.createState()
    ta3.addTransition(0, a1, "t"); ta3.addTransition(a1, end, "u")
    ta3.addTransition(0, a2, "t"); ta3.addTransition(a2, end, "u")
    ta3.setAccept(end)
    assert(ta3.paths() == Seq(Seq(Some("t"), Some("u"))))
  }

  test("guards: cycles, path cap, leading/trailing ANY, empty automaton") {
    val cyc = new TermAutomaton
    val s1 = cyc.createState()
    cyc.addTransition(0, s1, "a"); cyc.addTransition(s1, s1, "b")
    cyc.setAccept(s1)
    assert(intercept[IllegalArgumentException](cyc.paths())
      .getMessage.contains("cycle"))

    val ta = diamond()
    assert(intercept[IllegalArgumentException](ta.paths(maxPaths = 1))
      .getMessage.contains("more than 1"))

    val lead = new TermAutomaton
    val s1b = lead.createState(); val s2b = lead.createState()
    lead.addAnyTransition(0, s1b); lead.addTransition(s1b, s2b, "a")
    lead.setAccept(s2b)
    assert(intercept[IllegalArgumentException](lead.toIntervals())
      .getMessage.contains("start and end"))

    val none = new TermAutomaton
    none.setAccept(0) // only the empty path
    assert(intercept[IllegalArgumentException](none.toIntervals())
      .getMessage.contains("no non-empty"))
  }

  test("compilation: ANY folds into Extend; single path/term simplify") {
    val ta = diamond()
    assert(ta.toIntervals() == Or(Seq(
      Phrase(Seq(Term("a"), Term("b"))),
      Phrase(Seq(Extend(Term("a"), 0, 1), Term("b"))))))

    val one = new TermAutomaton
    val s1 = one.createState()
    one.addTransition(0, s1, "solo"); one.setAccept(s1)
    assert(one.toIntervals() == Term("solo"))

    // consecutive ANYs accumulate into one gap
    val gap2 = new TermAutomaton
    val g1 = gap2.createState(); val g2 = gap2.createState(); val g3 = gap2.createState()
    gap2.addTransition(0, g1, "a")
    gap2.addAnyTransition(g1, g2); gap2.addAnyTransition(g2, g3)
    val g4 = gap2.createState()
    gap2.addTransition(g3, g4, "b"); gap2.setAccept(g4)
    assert(gap2.toIntervals() == Phrase(Seq(Extend(Term("a"), 0, 2), Term("b"))))
  }

  test("matching fixtures: adjacent and gapped paths, union minimality") {
    val src = diamond().toIntervals()
    // "a b" at 1: both paths could match a@1 (b@2 adjacent; no b@3) →
    // the adjacent interval [1,2] only
    assert(ivs(src, Map("a" -> Array(1), "b" -> Array(2))) == Seq((1, 2)))
    // gap-only: a@1, b@3 matches just the ANY path
    assert(ivs(src, Map("a" -> Array(1), "b" -> Array(3))) == Seq((1, 3)))
    // both b@2 and b@3 present: [1,2] is contained in [1,3] → minimality
    // keeps [1,2] only (the reference's determinized automaton likewise
    // reports one match per start position)
    assert(ivs(src, Map("a" -> Array(1), "b" -> Array(2, 3))) == Seq((1, 2)))
    // no match when b is too far
    assert(ivs(src, Map("a" -> Array(1), "b" -> Array(4))) == Seq.empty)
    // two independent matches
    assert(ivs(src, Map("a" -> Array(1, 10), "b" -> Array(3, 11))) ==
      Seq((1, 3), (10, 11)))
  }
}
