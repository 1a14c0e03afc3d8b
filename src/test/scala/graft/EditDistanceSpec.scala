package graft

import graft.functions.EditDistance
import org.scalatest.funsuite.AnyFunSuite

/** Damerau–Levenshtein parity: fixtures pinning the unrestricted semantics
  * (DuckDB `damerau_levenshtein`, the oracle's function) and an exhaustive
  * BFS oracle over tiny alphabets — BFS over the four primitive ops
  * (insert/delete/substitute/adjacent-transpose) IS the unrestricted
  * distance by definition.
  */
class EditDistanceSpec extends AnyFunSuite {

  private def d(a: String, b: String, k: Int = 10): Int =
    EditDistance.damerauWithin(a, b, k)

  test("transposition counts as one edit (the reference FuzzyQuery default)") {
    assert(d("abcd", "abdc") == 1)
    assert(d("abcd", "bacd") == 1)
    assert(d("court", "ocurt") == 1)
    // plain Levenshtein would say 2 for each of these
  }

  test("unrestricted variant matches DuckDB on the classic OSA divergence") {
    assert(d("ca", "abc") == 2) // OSA gives 3; DuckDB damerau_levenshtein = 2
    assert(d("abc", "ca") == 2) // symmetric
  }

  test("degenerates to Levenshtein when no transpositions help") {
    assert(d("", "") == 0)
    assert(d("", "abc") == 3)
    assert(d("abc", "") == 3)
    assert(d("kitten", "sitting") == 3)
    assert(d("abc", "abc") == 0)
  }

  test("threshold semantics mirror Spark's 3-arg levenshtein (-1 beyond k)") {
    assert(d("kitten", "sitting", 2) == -1)
    assert(d("kitten", "sitting", 3) == 3)
    assert(d("abcd", "abdc", 1) == 1)
    assert(d("abcdefgh", "a", 2) == -1) // len-band short-circuit
  }

  /** Exhaustive BFS distance: minimum number of primitive ops transforming
    * a into b, ops applied in any order on the evolving string.
    */
  private def bfsDistance(a: String, b: String, alphabet: Seq[Char], maxD: Int): Int = {
    if (a == b) return 0
    var frontier = Set(a)
    val seen = collection.mutable.Set(a)
    for (depth <- 1 to maxD) {
      val next = collection.mutable.Set[String]()
      for (s <- frontier) {
        val edits = collection.mutable.Buffer[String]()
        for (i <- 0 to s.length; c <- alphabet) edits += s.substring(0, i) + c + s.substring(i)
        for (i <- s.indices) edits += s.substring(0, i) + s.substring(i + 1)
        for (i <- s.indices; c <- alphabet if c != s.charAt(i))
          edits += s.substring(0, i) + c + s.substring(i + 1)
        for (i <- 0 until s.length - 1)
          edits += s.substring(0, i) + s.charAt(i + 1) + s.charAt(i) + s.substring(i + 2)
        for (e <- edits if !seen.contains(e) && math.abs(e.length - b.length) <= maxD) {
          if (e == b) return depth
          seen += e; next += e
        }
      }
      frontier = next.toSet
    }
    maxD + 1
  }

  test("exhaustive duel vs BFS over all string pairs, alphabet {a,b}, len <= 4") {
    val alpha = Seq('a', 'b')
    val all = (0 to 4).flatMap(n =>
      (0 until math.pow(2, n).toInt).map(m =>
        (0 until n).map(i => alpha((m >> i) & 1)).mkString))
    for (x <- all; y <- all) {
      val expected = math.min(bfsDistance(x, y, alpha, 3), 4)
      val got = d(x, y, 3)
      val gotClamped = if (got == -1) 4 else got
      assert(gotClamped == expected, s"damerau('$x','$y'): got $got, BFS says $expected")
    }
  }

  test("spot duel vs BFS, alphabet {a,b,c}, len <= 3") {
    val alpha = Seq('a', 'b', 'c')
    val all = (0 to 3).flatMap(n =>
      (0 until math.pow(3, n).toInt).map(m =>
        (0 until n).map(i => alpha((m / math.pow(3, i).toInt) % 3)).mkString))
    for (x <- all; y <- all) {
      val expected = math.min(bfsDistance(x, y, alpha, 2), 3)
      val got = d(x, y, 2)
      val gotClamped = if (got == -1) 3 else got
      assert(gotClamped == expected, s"damerau('$x','$y'): got $got, BFS says $expected")
    }
  }
}
