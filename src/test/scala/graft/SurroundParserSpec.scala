package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search._
import graft.search.Intervals.{MaxWidth, Ordered, Unordered, Or => IOr, Term => ITerm}

/** Surround query language: grammar fixtures (precedence, prefix/infix
  * forms, wildcards, rejection rules) against the pure parser, plus
  * end-to-end matching through the searcher in PhraseQuerySpec's corpus.
  */
class SurroundParserSpec extends AnyFunSuite {

  private def parse(s: String, dict: Map[String, Seq[String]] = Map.empty) =
    SurroundParser.parse(s, _.toLowerCase,
      pat => dict.getOrElse(pat, Seq.empty))

  private def tq(t: String) = TermQuery(t)

  test("infix precedence: OR < AND < NOT < N < W, left-assoc") {
    assert(parse("a AND b OR c") == BoolQuery(Seq(
      BoolQuery(Seq(tq("a") -> Occur.Must, tq("b") -> Occur.Must)) -> Occur.Should,
      tq("c") -> Occur.Should)))
    assert(parse("a NOT b AND c") == BoolQuery(Seq(
      BoolQuery(Seq(tq("a") -> Occur.Must, tq("b") -> Occur.MustNot)) -> Occur.Must,
      tq("c") -> Occur.Must)))
    assert(parse("a 3W b OR c") == BoolQuery(Seq(
      IntervalQuery(MaxWidth(Ordered(Seq(ITerm("a"), ITerm("b"))), 4)) -> Occur.Should,
      tq("c") -> Occur.Should)))
    // W binds tighter than N: a N b W c = N(a, W(b,c)); the outer width is
    // slop (dist-1=0) + Σ child minExtents (1 for a, 2 for the nested pair)
    // — the reference's SpanNearQuery extent algebra; a width of 2 would
    // make any match (>= 3 positions) impossible
    assert(parse("a N b W c") == IntervalQuery(
      MaxWidth(Unordered(Seq(ITerm("a"),
        MaxWidth(Ordered(Seq(ITerm("b"), ITerm("c"))), 2))), 3)))
  }

  test("prefix forms, distance defaults, multi-arg") {
    assert(parse("3N(a, b, c)") == IntervalQuery(
      MaxWidth(Unordered(Seq(ITerm("a"), ITerm("b"), ITerm("c"))), 5)))
    assert(parse("W(a, b)") == IntervalQuery(
      MaxWidth(Ordered(Seq(ITerm("a"), ITerm("b"))), 2)))
    assert(parse("NOT(a, b, c)") == BoolQuery(Seq(
      tq("a") -> Occur.Must, tq("b") -> Occur.MustNot, tq("c") -> Occur.MustNot)))
    assert(parse("AND(OR(a, b), c)") == BoolQuery(Seq(
      BoolQuery(Seq(tq("a") -> Occur.Should, tq("b") -> Occur.Should)) -> Occur.Must,
      tq("c") -> Occur.Must)))
  }

  test("wildcards expand; empty expansion collapses the clause") {
    val dict = Map("b*" -> Seq("big", "batch"), "z*" -> Seq.empty[String])
    assert(parse("2N(a, b*)", dict) == IntervalQuery(
      MaxWidth(Unordered(Seq(ITerm("a"),
        IOr(Seq(ITerm("big"), ITerm("batch"))))), 3)))
    assert(parse("b* OR a", dict) == BoolQuery(Seq(
      BoolQuery(Seq(tq("big") -> Occur.Should, tq("batch") -> Occur.Should)) -> Occur.Should,
      tq("a") -> Occur.Should)))
    assert(parse("2N(a, z*)", dict) == MatchNoneQuery)
  }

  test("AND/NOT inside a distance operator is rejected; parse errors throw") {
    intercept[IllegalArgumentException](parse("3N(a AND b, c)"))
    intercept[IllegalArgumentException](parse("2W(NOT(a, b), c)"))
    intercept[IllegalArgumentException](parse("(a AND b"))
    intercept[IllegalArgumentException](parse("a )"))
    intercept[IllegalArgumentException](parse(""))
  }

  test("operators are case-insensitive; terms analyze (lowercase)") {
    assert(parse("A and B") == BoolQuery(Seq(
      tq("a") -> Occur.Must, tq("b") -> Occur.Must)))
    assert(parse("2n(A, B)") == IntervalQuery(
      MaxWidth(Unordered(Seq(ITerm("a"), ITerm("b"))), 3)))
  }
}
