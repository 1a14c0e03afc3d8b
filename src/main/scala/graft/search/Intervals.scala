package graft.search

/** Interval (span) query algebra — the re-expression of the reference's
  * intervals module
  * (`/root/reference/lucene/queries/src/java/org/apache/lucene/queries/intervals/Intervals.java`,
  * `IntervalsSource.java`): proximity combinators beyond a flat sloppy
  * phrase, composable to arbitrary depth — `unordered(phrase(a,b), c)`,
  * `containedBy(or(a,b), unordered(c,d))`, width-bounded nears.
  *
  * Semantics are *minimal-interval* semantics (the reference follows
  * Vigna's "Efficient optimally lazy algorithms for minimal-interval
  * semantics"): each source yields, per document, the set of intervals
  * [start, end] (analyzer token positions, inclusive) that match and
  * contain no other matching interval. Evaluation here is per-document
  * over the decoded position lists — documents are matched distributively
  * (the leapfrog machinery of the phrase path), and the per-doc interval
  * combination is local, exactly the shape that scales: candidate docs
  * prune first, positions decode lazily per posting block.
  *
  * Divergences from the reference, by design:
  *  - `maxgaps` is not carried (interval width bounds proximity instead —
  *    `maxWidth(w)`; with k leaf terms, gaps = width - k for point leaves);
  *  - `unordered` permits overlapping child intervals (the reference's
  *    default `unordered` also does; `unorderedNoOverlaps` is not built).
  */
object Intervals {

  sealed trait Source {
    /** All dictionary terms the source touches. */
    def terms: Seq[String]
    /** Terms that MUST be present in a matching doc (pre-filter). Empty
      * under a disjunction.
      */
    def required: Seq[String]
  }

  /** One term — intervals are its positions, as points [p, p]. */
  final case class Term(t: String) extends Source {
    def terms: Seq[String] = Seq(t)
    def required: Seq[String] = Seq(t)
  }

  /** Contiguous sequence: child k+1 starts exactly where child k ended + 1
    * (ref `Intervals.phrase`).
    */
  final case class Phrase(children: Seq[Source]) extends Source {
    require(children.nonEmpty)
    def terms: Seq[String] = children.flatMap(_.terms)
    def required: Seq[String] = children.flatMap(_.required)
  }

  /** In order, non-overlapping: child k+1 starts after child k ends
    * (ref `Intervals.ordered`).
    */
  final case class Ordered(children: Seq[Source]) extends Source {
    require(children.nonEmpty)
    def terms: Seq[String] = children.flatMap(_.terms)
    def required: Seq[String] = children.flatMap(_.required)
  }

  /** All children present in a window, any order, overlaps allowed
    * (ref `Intervals.unordered`).
    */
  final case class Unordered(children: Seq[Source]) extends Source {
    require(children.nonEmpty)
    def terms: Seq[String] = children.flatMap(_.terms)
    def required: Seq[String] = children.flatMap(_.required)
  }

  /** Union of child intervals (ref `Intervals.or`). */
  final case class Or(children: Seq[Source]) extends Source {
    require(children.nonEmpty)
    def terms: Seq[String] = children.flatMap(_.terms)
    def required: Seq[String] = Seq.empty // any one child suffices
  }

  /** Keep only intervals with end - start + 1 <= width
    * (ref `Intervals.maxwidth`).
    */
  final case class MaxWidth(child: Source, width: Int) extends Source {
    def terms: Seq[String] = child.terms
    def required: Seq[String] = child.required
  }

  /** Intervals of `big` that contain >= 1 interval of `small`
    * (ref `Intervals.containing`).
    */
  final case class Containing(big: Source, small: Source) extends Source {
    def terms: Seq[String] = big.terms ++ small.terms
    def required: Seq[String] = big.required ++ small.required
  }

  /** Intervals of `small` lying within >= 1 interval of `big`
    * (ref `Intervals.containedBy`).
    */
  final case class ContainedBy(small: Source, big: Source) extends Source {
    def terms: Seq[String] = small.terms ++ big.terms
    def required: Seq[String] = small.required ++ big.required
  }

  /** Intervals of `minuend` that contain NO interval of `subtrahend`
    * (ref `Intervals.notContaining`). The subtrahend's terms are decoded
    * but never required — a doc without them matches trivially.
    */
  final case class NotContaining(minuend: Source, subtrahend: Source) extends Source {
    def terms: Seq[String] = minuend.terms ++ subtrahend.terms
    def required: Seq[String] = minuend.required
  }

  /** Intervals of `small` NOT lying within any interval of `big`
    * (ref `Intervals.notContainedBy`).
    */
  final case class NotContainedBy(small: Source, big: Source) extends Source {
    def terms: Seq[String] = small.terms ++ big.terms
    def required: Seq[String] = small.required
  }

  /** Intervals of `minuend` that do not overlap any interval of
    * `subtrahend` (ref `Intervals.nonOverlapping`).
    */
  final case class NonOverlapping(minuend: Source, subtrahend: Source) extends Source {
    def terms: Seq[String] = minuend.terms ++ subtrahend.terms
    def required: Seq[String] = minuend.required
  }

  /** Intervals of `source` that end before (some interval of) `reference`
    * starts (ref `Intervals.before`). The reference must occur, so its
    * terms are required.
    */
  final case class Before(source: Source, reference: Source) extends Source {
    def terms: Seq[String] = source.terms ++ reference.terms
    def required: Seq[String] = source.required ++ reference.required
  }

  /** Intervals of `source` that start after (some interval of) `reference`
    * ends (ref `Intervals.after`).
    */
  final case class After(source: Source, reference: Source) extends Source {
    def terms: Seq[String] = source.terms ++ reference.terms
    def required: Seq[String] = source.required ++ reference.required
  }

  /** Intervals of `source` overlapping >= 1 interval of `reference`
    * (ref `Intervals.overlapping`).
    */
  final case class Overlapping(source: Source, reference: Source) extends Source {
    def terms: Seq[String] = source.terms ++ reference.terms
    def required: Seq[String] = source.required ++ reference.required
  }

  /** Intervals of `minuend` that do NOT appear within `positions` of any
    * interval of `subtrahend` (ref `Intervals.notWithin`). The subtrahend
    * is never required — a doc without it matches trivially.
    */
  final case class NotWithin(minuend: Source, positions: Int,
      subtrahend: Source) extends Source {
    def terms: Seq[String] = minuend.terms ++ subtrahend.terms
    def required: Seq[String] = minuend.required
  }

  /** Each child interval widened by `before` positions on the left (floored
    * at 0) and `after` on the right (ref `Intervals.extend`).
    */
  final case class Extend(child: Source, before: Int, after: Int) extends Source {
    def terms: Seq[String] = child.terms
    def required: Seq[String] = child.required
  }

  /** Minimum possible extent (width) of any interval the source can emit —
    * the reference's `IntervalsSource#minExtent`, which anchors the sloppy
    * frequency `1 / max(len - minExtent + 1, 1)` so a tightest-possible
    * match contributes exactly 1.
    */
  def minExtent(src: Source): Int = src match {
    case Term(_)              => 1
    case Phrase(cs)           => cs.map(minExtent).sum
    case Ordered(cs)          => cs.map(minExtent).sum
    case Unordered(cs)        => cs.map(minExtent).sum
    case Or(cs)               => cs.map(minExtent).min
    case MaxWidth(c, _)       => minExtent(c)
    case Containing(big, _)   => minExtent(big)
    case ContainedBy(s, _)    => minExtent(s)
    case NotContaining(m, _)  => minExtent(m)
    case NotContainedBy(s, _) => minExtent(s)
    case NonOverlapping(m, _) => minExtent(m)
    case Before(s, _)         => minExtent(s)
    case After(s, _)          => minExtent(s)
    case Overlapping(s, _)    => minExtent(s)
    case NotWithin(m, _, _)   => minExtent(m)
    case Extend(c, b, a)      => minExtent(c) + b + a
  }

  // ---------------------------------------------------------- evaluation

  // Intervals pack as (start << 32) | end; lists sorted by start (and,
  // once minimized, by end too — a containment-free list has strictly
  // increasing starts AND ends, which the combiners below rely on).
  @inline private def pack(s: Int, e: Int): Long = (s.toLong << 32) | (e.toLong & 0xffffffffL)
  @inline def startOf(iv: Long): Int = (iv >>> 32).toInt
  @inline def endOf(iv: Long): Int = (iv & 0xffffffffL).toInt

  /** Drop intervals that properly contain another interval; dedupe. Input
    * sorted by (start, end); output sorted with strictly increasing starts
    * and ends.
    */
  private[search] def minimize(ivs: Array[Long]): Array[Long] = {
    if (ivs.length <= 1) return ivs
    java.util.Arrays.sort(ivs) // (start asc, end asc) — ends sit in the low bits
    // pass 1: collapse equal-start runs to their smallest end (the first of
    // the run) — any longer interval with the same start contains it
    val tmp = new Array[Long](ivs.length)
    var m = 0
    var i = 0
    while (i < ivs.length) {
      if (i == 0 || startOf(ivs(i)) != startOf(ivs(i - 1))) { tmp(m) = ivs(i); m += 1 }
      i += 1
    }
    // pass 2 (starts now strictly increasing), right-to-left: keep an
    // interval iff its end < every kept end to its right — a later start
    // with end <= mine means mine contains it
    val keep = new Array[Boolean](m)
    var minEnd = Int.MaxValue
    i = m - 1
    while (i >= 0) {
      val e = endOf(tmp(i))
      if (e < minEnd) { keep(i) = true; minEnd = e }
      i -= 1
    }
    val out = new Array[Long](keep.count(identity))
    var j = 0
    i = 0
    while (i < m) { if (keep(i)) { out(j) = tmp(i); j += 1 }; i += 1 }
    out
  }

  /** Evaluate a source against one document's per-term position lists
    * (sorted ascending; absent terms yield empty arrays). Returns the
    * minimal intervals, sorted, strictly increasing starts and ends.
    */
  def eval(src: Source, pos: String => Array[Int]): Array[Long] = src match {
    case Term(t) =>
      val ps = pos(t)
      val out = new Array[Long](ps.length)
      var i = 0
      while (i < ps.length) { out(i) = pack(ps(i), ps(i)); i += 1 }
      out
    case Or(children) =>
      minimize(children.toArray.flatMap(c => eval(c, pos)))
    case MaxWidth(child, w) =>
      eval(child, pos).filter(iv => endOf(iv) - startOf(iv) + 1 <= w)
    case Phrase(children) =>
      val lists = children.map(eval(_, pos)).toArray
      if (lists.exists(_.isEmpty)) Array.emptyLongArray
      else minimize(evalPhrase(lists))
    case Ordered(children) =>
      val lists = children.map(eval(_, pos)).toArray
      if (lists.exists(_.isEmpty)) Array.emptyLongArray
      else minimize(evalOrdered(lists))
    case Unordered(children) =>
      val lists = children.map(eval(_, pos)).toArray
      if (lists.exists(_.isEmpty)) Array.emptyLongArray
      else minimize(evalUnordered(lists))
    case Containing(big, small) =>
      val b = eval(big, pos); val s = eval(small, pos)
      if (s.isEmpty) Array.emptyLongArray
      else b.filter(iv => s.exists(sv =>
        startOf(sv) >= startOf(iv) && endOf(sv) <= endOf(iv)))
    case ContainedBy(small, big) =>
      val s = eval(small, pos); val b = eval(big, pos)
      if (b.isEmpty) Array.emptyLongArray
      else s.filter(iv => b.exists(bv =>
        startOf(iv) >= startOf(bv) && endOf(iv) <= endOf(bv)))
    case NotContaining(minuend, subtrahend) =>
      val a = eval(minuend, pos); val b = eval(subtrahend, pos)
      if (b.isEmpty) a
      else a.filter(iv => !b.exists(sv =>
        startOf(sv) >= startOf(iv) && endOf(sv) <= endOf(iv)))
    case NotContainedBy(small, big) =>
      val a = eval(small, pos); val b = eval(big, pos)
      if (b.isEmpty) a
      else a.filter(iv => !b.exists(bv =>
        startOf(iv) >= startOf(bv) && endOf(iv) <= endOf(bv)))
    case NonOverlapping(minuend, subtrahend) =>
      val a = eval(minuend, pos); val b = eval(subtrahend, pos)
      if (b.isEmpty) a
      else a.filter(iv => !b.exists(bv =>
        startOf(bv) <= endOf(iv) && endOf(bv) >= startOf(iv)))
    case Before(source, reference) =>
      val a = eval(source, pos); val b = eval(reference, pos)
      if (b.isEmpty) Array.emptyLongArray
      else {
        val maxStart = b.iterator.map(startOf).max
        a.filter(iv => endOf(iv) < maxStart)
      }
    case After(source, reference) =>
      val a = eval(source, pos); val b = eval(reference, pos)
      if (b.isEmpty) Array.emptyLongArray
      else {
        val minEnd = b.iterator.map(endOf).min
        a.filter(iv => startOf(iv) > minEnd)
      }
    case Overlapping(source, reference) =>
      val a = eval(source, pos); val b = eval(reference, pos)
      if (b.isEmpty) Array.emptyLongArray
      else a.filter(iv => b.exists(bv =>
        startOf(bv) <= endOf(iv) && endOf(bv) >= startOf(iv)))
    case NotWithin(minuend, positions, subtrahend) =>
      val a = eval(minuend, pos); val b = eval(subtrahend, pos)
      if (b.isEmpty) a
      else a.filter(iv => !b.exists(bv =>
        startOf(bv) - positions <= endOf(iv) &&
          endOf(bv) + positions >= startOf(iv)))
    case Extend(child, before, after) =>
      minimize(eval(child, pos).map(iv =>
        pack(math.max(startOf(iv) - before, 0), endOf(iv) + after)))
  }

  /** Contiguous chains: child k+1's interval starts at prev end + 1. DFS
    * over the (minimized, so start-unique) child lists; each child
    * contributes at most one interval per chain position, so the walk is
    * linear per starting interval.
    */
  private def evalPhrase(lists: Array[Array[Long]]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val first = lists(0)
    var i = 0
    while (i < first.length) {
      var ok = true
      var end = endOf(first(i))
      var k = 1
      while (ok && k < lists.length) {
        // minimized lists have unique starts: binary search on start
        val idx = lowerBound(lists(k), end + 1)
        if (idx < lists(k).length && startOf(lists(k)(idx)) == end + 1)
          end = endOf(lists(k)(idx))
        else ok = false
        k += 1
      }
      if (ok) out += pack(startOf(first(i)), end)
      i += 1
    }
    out.toArray
  }

  /** Ordered, non-overlapping: for each first-child interval, greedily pick
    * for every subsequent child the first interval starting after the
    * previous end — minimal end, because minimized lists have ends
    * increasing with starts. Collect over all first-child choices,
    * minimize after.
    */
  private def evalOrdered(lists: Array[Array[Long]]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val first = lists(0)
    var i = 0
    while (i < first.length) {
      var ok = true
      var end = endOf(first(i))
      var k = 1
      while (ok && k < lists.length) {
        val idx = lowerBound(lists(k), end + 1)
        if (idx < lists(k).length) end = endOf(lists(k)(idx))
        else ok = false
        k += 1
      }
      if (ok) out += pack(startOf(first(i)), end)
      i += 1
    }
    out.toArray
  }

  /** Unordered windows: the k-list minimal-range sweep — take the window
    * [min start, max end] over one interval per child, record, advance the
    * child holding the minimum start. Minimized child lists make each
    * sweep step yield the best window for its leftmost constituent.
    */
  private def evalUnordered(lists: Array[Array[Long]]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val idx = new Array[Int](lists.length)
    var done = false
    while (!done) {
      var minStart = Int.MaxValue
      var maxEnd = -1
      var minK = -1
      var k = 0
      while (k < lists.length) {
        val iv = lists(k)(idx(k))
        if (startOf(iv) < minStart) { minStart = startOf(iv); minK = k }
        if (endOf(iv) > maxEnd) maxEnd = endOf(iv)
        k += 1
      }
      out += pack(minStart, maxEnd)
      idx(minK) += 1
      if (idx(minK) >= lists(minK).length) done = true
    }
    out.toArray
  }

  /** First index whose interval start >= target (lists have unique,
    * ascending starts after minimize).
    */
  private def lowerBound(list: Array[Long], targetStart: Int): Int = {
    var lo = 0
    var hi = list.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (startOf(list(mid)) < targetStart) lo = mid + 1 else hi = mid
    }
    lo
  }
}
