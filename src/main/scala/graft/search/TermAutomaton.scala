package graft.search

import scala.collection.mutable

/** Token-automaton proximity query (ref /root/reference/lucene/sandbox/src/
  * java/org/apache/lucene/sandbox/search/TermAutomatonQuery.java): an NFA
  * over TOKENS whose accepted paths are the token sequences a document must
  * contain contiguously. The reference runs the determinized automaton
  * directly against postings enums ([`TermAutomatonScorer`]); here the
  * automaton COMPILES onto the intervals algebra — each accepted label path
  * becomes a contiguous interval [[Intervals.Phrase]], an ANY transition
  * (ref `addAnyTransition`) becomes a one-position gap folded into the
  * preceding term's [[Intervals.Extend]], and the path set unions under
  * [[Intervals.Or]]. Scoring, explain, and the DuckDB oracle then ride the
  * already-verified [[graft.search.IntervalQuery]] machinery instead of a
  * bespoke scorer.
  *
  * Build the automaton exactly like the reference: `createState()`,
  * `addTransition(from, to, term)` / `addAnyTransition(from, to)`,
  * `setAccept(state)`, then [[toIntervals]] (the analogue of `finish()`).
  * The usual source is a graph token stream — multi-word synonyms or
  * analysis-time holes (ref `TokenStreamToTermAutomatonQuery.java`), which
  * produce DAGs; [[paths]] rejects cycles (a cyclic token automaton accepts
  * unbounded paths — the reference's `finish()` likewise assumes the
  * det-automaton is finite) and caps enumeration at `maxPaths`.
  *
  * Two documented narrowings vs the reference: paths must START and END on
  * term transitions (a leading/trailing ANY constrains tokens outside the
  * matched span, which an interval cannot see), and ANY matches a POSITION
  * gap — identical to the reference when positions are dense, and to
  * Lucene's phrase-with-gap behavior when stopword removal left holes.
  */
final class TermAutomaton {
  private val trans = mutable.ArrayBuffer[(Int, Int, Option[String])]()
  private val accept = mutable.BitSet()
  private var states = 1 // state 0 is initial, like the reference

  def numStates: Int = states

  def createState(): Int = { states += 1; states - 1 }

  private def checkState(s: Int): Unit =
    require(s >= 0 && s < states, s"state $s out of range [0, $states)")

  def setAccept(state: Int): Unit = { checkState(state); accept += state }

  def addTransition(from: Int, to: Int, term: String): Unit = {
    checkState(from); checkState(to)
    require(term.nonEmpty, "empty term label")
    trans += ((from, to, Some(term)))
  }

  /** Matches any single token at this position (ref `addAnyTransition`). */
  def addAnyTransition(from: Int, to: Int): Unit = {
    checkState(from); checkState(to)
    trans += ((from, to, None))
  }

  /** All accepted label paths from state 0 (None = ANY), DFS in insertion
    * order, deduped. Throws on cycles reachable from state 0 and on more
    * than `maxPaths` accepted paths.
    */
  def paths(maxPaths: Int = 1024): Seq[Seq[Option[String]]] = {
    val byFrom = trans.groupBy(_._1)
    val out = mutable.LinkedHashSet[Seq[Option[String]]]()
    def dfs(state: Int, onPath: Set[Int], labels: List[Option[String]]): Unit = {
      if (accept(state) && labels.nonEmpty) {
        out += labels.reverse
        require(out.size <= maxPaths,
          s"automaton accepts more than $maxPaths paths")
      }
      byFrom.getOrElse(state, Nil).foreach { case (_, to, label) =>
        require(!onPath.contains(to),
          s"cycle through state $to — token automata must be acyclic")
        dfs(to, onPath + to, label :: labels)
      }
    }
    dfs(0, Set(0), Nil)
    out.toSeq
  }

  /** Compile to an intervals source: Or over per-path contiguous phrases.
    * The analogue of the reference's `finish()` + rewrite.
    */
  def toIntervals(maxPaths: Int = 1024): Intervals.Source = {
    val ps = paths(maxPaths)
    require(ps.nonEmpty, "automaton accepts no non-empty paths")
    val srcs = ps.map(pathSource)
    if (srcs.size == 1) srcs.head else Intervals.Or(srcs)
  }

  private def pathSource(p: Seq[Option[String]]): Intervals.Source = {
    require(p.head.isDefined && p.last.isDefined,
      "paths must start and end with term transitions " +
        "(leading/trailing ANY is outside interval semantics)")
    // group each term with the run of ANYs that follows it: the gap folds
    // into Extend(term, 0, gap), and Phrase keeps the next term adjacent
    val groups = mutable.ArrayBuffer[(String, Int)]()
    p.foreach {
      case Some(t) => groups += ((t, 0))
      case None =>
        val (t, g) = groups.last; groups(groups.size - 1) = (t, g + 1)
    }
    val children: Seq[Intervals.Source] = groups.toSeq.map { case (t, g) =>
      if (g == 0) Intervals.Term(t) else Intervals.Extend(Intervals.Term(t), 0, g)
    }
    if (children.size == 1) children.head else Intervals.Phrase(children)
  }
}
