package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.RegexPrefix

/** RegexPrefix = the syntactic re-expression of the reference's automaton
  * common prefix (`util/automaton/Operations.getCommonPrefix`). Fixtures
  * pin the factoring behavior; the enumeration test proves the soundness
  * contract (every `rlike`-matched string starts with the prefix) over all
  * short strings of each pattern's alphabet.
  */
class RegexPrefixSpec extends AnyFunSuite {

  val fixtures: Seq[(String, String)] = Seq(
    "^abc" -> "abc",
    "^(stream|strong)" -> "str", // factored grouped alternation
    "^(stream|strong)$" -> "str",
    "^st(r|l)ong" -> "st",
    "^ab(?:cd|ce)f" -> "abc", // non-capturing group, prefix continues past it
    "^(foo)bar" -> "foobar", // exact group, concatenation continues
    "^(foo|foobar)baz" -> "foo",
    "^(a(b|c)d|a(b|c)e)" -> "a", // nested groups
    "^ab|cd" -> "", // top-level alternation: 2nd branch unanchored under rlike
    "abc" -> "", // unanchored
    "^a.b" -> "a",
    "^a[bc]d" -> "a",
    "^ab?c" -> "a", // optional factor ends the prefix
    "^ab*c" -> "a",
    "^ab+c" -> "ab", // one mandatory occurrence
    "^a{2}b" -> "a",
    "^a{0,2}b" -> "",
    "^\\d+x" -> "", // class shorthand: nothing mandatory
    "^a\\.b" -> "a.b", // escaped literal joins the prefix
    "^ab(?=c)d" -> "ab", // lookahead: stop, keep what's collected
    "^(ab(?=c))" -> "ab"
  )

  test("fixtures: factored common prefixes") {
    for ((re, want) <- fixtures)
      assert(RegexPrefix.of(re) == want, s"pattern $re")
  }

  test("soundness: every rlike-matched string starts with the prefix") {
    for ((re, _) <- fixtures) {
      val prefix = RegexPrefix.of(re)
      val p = java.util.regex.Pattern.compile(re)
      val alphabet = (re.filter(_.isLetterOrDigit).distinct + "z").toSeq
      var pool: Seq[String] = Seq("")
      var checked = 0
      for (_ <- 1 to 4) {
        pool = for (s <- pool; c <- alphabet) yield s + c
        for (s <- pool if p.matcher(s).find()) {
          checked += 1
          assert(s.startsWith(prefix),
            s"pattern $re: matched '$s' does not start with prefix '$prefix'")
        }
      }
    }
  }
}
