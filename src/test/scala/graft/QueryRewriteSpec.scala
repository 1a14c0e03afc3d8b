package graft

import graft.search._
import org.scalatest.funsuite.AnyFunSuite

/** `Query.rewrite` fixtures — the reference's `BooleanQuery#rewrite`
  * normalizations (`search/BooleanQuery.java:269-470`) and `BoostQuery`
  * folding, asserted shape-by-shape.
  */
class QueryRewriteSpec extends AnyFunSuite {
  import Occur._

  private def t(s: String) = TermQuery(s)

  test("empty and pure-negative booleans collapse to MatchNone") {
    assert(Query.rewrite(BoolQuery(Seq.empty)) == MatchNoneQuery)
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> MustNot))) == MatchNoneQuery)
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> MustNot, t("b") -> MustNot))) == MatchNoneQuery)
  }

  test("single-clause booleans flatten") {
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Should))) == t("a"))
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Must))) == t("a"))
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Should), minimumShouldMatch = 1)) == t("a"))
    // lone FILTER scores 0 (ref :291-293 BoostQuery(ConstantScore, 0))
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Filter))) == ConstScoreQuery(t("a"), 0.0))
  }

  test("required MatchNone fails the query; optional MatchNone drops") {
    val none = BoolQuery(Seq.empty) // rewrites to MatchNone
    assert(Query.rewrite(BoolQuery(Seq(none -> Must, t("a") -> Should))) == MatchNoneQuery)
    assert(Query.rewrite(BoolQuery(Seq(none -> Filter, t("a") -> Should))) == MatchNoneQuery)
    assert(Query.rewrite(BoolQuery(Seq(none -> Should, t("a") -> Should))) == t("a"))
    assert(Query.rewrite(BoolQuery(Seq(none -> MustNot, t("a") -> Must))) == t("a"))
    // msm no longer satisfiable after dropping a SHOULD MatchNone
    assert(Query.rewrite(BoolQuery(Seq(none -> Should, t("a") -> Should),
      minimumShouldMatch = 2)) == MatchNoneQuery)
  }

  test("duplicate FILTER and MUST_NOT clauses deduplicate") {
    val q = Query.rewrite(BoolQuery(Seq(
      t("a") -> Must, t("f") -> Filter, t("f") -> Filter,
      t("n") -> MustNot, t("n") -> MustNot)))
    assert(q == BoolQuery(Seq(t("a") -> Must, t("f") -> Filter, t("n") -> MustNot)))
  }

  test("required-and-excluded contradiction -> MatchNone") {
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Must, t("a") -> MustNot))) == MatchNoneQuery)
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Filter, t("b") -> Must, t("a") -> MustNot)))
      == MatchNoneQuery)
  }

  test("a FILTER duplicating a MUST drops; duplicating a SHOULD promotes") {
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Must, t("a") -> Filter, t("b") -> Should)))
      == BoolQuery(Seq(t("a") -> Must, t("b") -> Should)))
    // SHOULD promoted to MUST, filter copy dropped, msm decremented
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Should, t("a") -> Filter, t("b") -> Should),
      minimumShouldMatch = 1))
      == BoolQuery(Seq(t("a") -> Must, t("b") -> Should)))
  }

  test("duplicate scoring clauses merge by summing boosts") {
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Should, t("a") -> Should, t("b") -> Should)))
      == BoolQuery(Seq(BoostQuery(t("a"), 2.0) -> Should, t("b") -> Should)))
    assert(Query.rewrite(BoolQuery(Seq(
      BoostQuery(t("a"), 1.5) -> Should, t("a") -> Should, t("b") -> Should)))
      == BoolQuery(Seq(BoostQuery(t("a"), 2.5) -> Should, t("b") -> Should)))
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Must, t("a") -> Must, t("b") -> Should)))
      == BoolQuery(Seq(BoostQuery(t("a"), 2.0) -> Must, t("b") -> Should)))
    // msm > 1 blocks SHOULD dedup (the match count would change)
    val kept = Query.rewrite(BoolQuery(Seq(t("a") -> Should, t("a") -> Should),
      minimumShouldMatch = 2))
    assert(kept == BoolQuery(Seq(t("a") -> Should, t("a") -> Should), minimumShouldMatch = 2))
  }

  test("merging duplicates re-flattens a now-single clause") {
    assert(Query.rewrite(BoolQuery(Seq(t("a") -> Should, t("a") -> Should)))
      == BoostQuery(t("a"), 2.0))
  }

  test("boost folding") {
    assert(Query.rewrite(BoostQuery(t("a"), 1.0)) == t("a"))
    assert(Query.rewrite(BoostQuery(BoostQuery(t("a"), 2.0), 3.0)) == BoostQuery(t("a"), 6.0))
    assert(Query.rewrite(BoostQuery(BoolQuery(Seq.empty), 2.0)) == MatchNoneQuery)
    assert(Query.rewrite(BoostQuery(BoostQuery(t("a"), 2.0), 0.5)) == t("a"))
  }

  test("const-score and dismax normalize") {
    assert(Query.rewrite(ConstScoreQuery(ConstScoreQuery(t("a"), 9.0), 2.0))
      == ConstScoreQuery(t("a"), 2.0))
    assert(Query.rewrite(ConstScoreQuery(BoolQuery(Seq.empty), 2.0)) == MatchNoneQuery)
    assert(Query.rewrite(DisMaxQuery(Seq(BoolQuery(Seq.empty), t("a")), 0.3)) == t("a"))
    assert(Query.rewrite(DisMaxQuery(Seq(BoolQuery(Seq.empty)), 0.3)) == MatchNoneQuery)
  }

  test("nested booleans rewrite recursively") {
    val inner = BoolQuery(Seq(t("x") -> Should)) // flattens to t(x)
    assert(Query.rewrite(BoolQuery(Seq(inner -> Must, t("y") -> Should)))
      == BoolQuery(Seq(t("x") -> Must, t("y") -> Should)))
  }
}
