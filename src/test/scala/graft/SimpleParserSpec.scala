package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search._

/** SimpleQueryParser re-expression (ref `queryparser/simple/
  * SimpleQueryParser.java`): operator syntax, precedence, negation raising,
  * multi-term rewrites, and the never-throws degradation contract.
  */
class SimpleParserSpec extends AnyFunSuite {

  private val rw: MultiTerm => Query = {
    case MultiTerm.Prefix(p)   => TermQuery(s"PRE:$p")
    case MultiTerm.Fuzzy(t, n) => TermQuery(s"FZ:$t:$n")
    case mt                    => TermQuery(s"MT:$mt")
  }
  private def p(s: String): Query = SimpleParser.parse(s, identity, rw)

  test("whitespace = OR (default), '+' = AND binding tighter than '|'") {
    assert(p("a b") == Query.or("a", "b"))
    assert(p("a + b") == Query.and("a", "b"))
    assert(p("a + b | c") == BoolQuery(Seq(
      Query.and("a", "b") -> Occur.Should, TermQuery("c") -> Occur.Should)))
    assert(p("a | b + c") == BoolQuery(Seq(
      TermQuery("a") -> Occur.Should, Query.and("b", "c") -> Occur.Should)))
  }

  test("default-AND mode joins on whitespace") {
    assert(SimpleParser.parse("a b", identity, rw, defaultAnd = true) ==
      Query.and("a", "b"))
    assert(SimpleParser.parse("a b | c", identity, rw, defaultAnd = true) ==
      BoolQuery(Seq(Query.and("a", "b") -> Occur.Should,
        TermQuery("c") -> Occur.Should)))
  }

  test("negation: in-run MUST_NOT, top-level raising, pure-negative -> none") {
    assert(p("a + -b") == BoolQuery(Seq(
      TermQuery("a") -> Occur.Must, TermQuery("b") -> Occur.MustNot)))
    assert(p("a -b") == BoolQuery(Seq(
      TermQuery("a") -> Occur.Should, TermQuery("b") -> Occur.MustNot)))
    assert(p("-a") == MatchNoneQuery)
    assert(p("-a | b") == BoolQuery(Seq(
      TermQuery("b") -> Occur.Should, TermQuery("a") -> Occur.MustNot)))
    // '-' inside a term is literal
    assert(p("state-of-art") == TermQuery("state-of-art"))
  }

  test("phrases, slop, prefix, fuzzy") {
    assert(p("\"x y\"") == PhraseQuery(Seq("x", "y"), 0))
    assert(p("\"x y\"~3") == PhraseQuery(Seq("x", "y"), 3))
    assert(p("\"x\"") == TermQuery("x"))
    assert(p("qu*") == TermQuery("PRE:qu"))
    assert(p("bob~1") == TermQuery("FZ:bob:1"))
    assert(p("bob~") == TermQuery("FZ:bob:2"))
    assert(p("bob~7") == TermQuery("FZ:bob:2")) // edits cap at 2
    assert(p("bob~0") == TermQuery("bob"))      // 0 edits = exact
  }

  test("grouping and escapes") {
    assert(p("(a | b) + c") == BoolQuery(Seq(
      Query.or("a", "b") -> Occur.Must, TermQuery("c") -> Occur.Must)))
    assert(p("-(a b) c") == BoolQuery(Seq(
      TermQuery("c") -> Occur.Should, Query.or("a", "b") -> Occur.MustNot)))
    assert(p("a\\+b") == TermQuery("a+b"))
    assert(p("x\\*") == TermQuery("x*")) // escaped star is literal, not prefix
  }

  test("never throws: malformed input degrades to the literal terms") {
    assert(p("((a") == TermQuery("a"))
    assert(p("\"unclosed b") == PhraseQuery(Seq("unclosed", "b"), 0))
    assert(p("a ) b") == Query.or("a", "b"))
    assert(p("|||") == MatchNoneQuery)
    assert(p("+") == MatchNoneQuery)
    assert(p("-") == MatchNoneQuery)
    assert(p("") == MatchNoneQuery)
    assert(p("a + | b") == Query.or("a", "b")) // dangling '+' drops
    // fuzzed: arbitrary operator soup never escapes the contract
    val rnd = new scala.util.Random(7)
    val chars = "ab c()|+-\"~*\\"
    (0 until 500).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(20))(chars(rnd.nextInt(chars.length))).mkString
      SimpleParser.parse(s, identity, rw) // must not throw
    }
  }
}
