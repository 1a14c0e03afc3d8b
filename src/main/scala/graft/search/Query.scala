package graft.search

/** Boolean occurrence classes (ref
  * `/root/reference/lucene/core/src/java/org/apache/lucene/search/BooleanClause.java`).
  */
sealed trait Occur extends Serializable
object Occur {
  case object Should extends Occur
  case object Must extends Occur
  case object MustNot extends Occur
  case object Filter extends Occur
}

/** Query tree: terms + nested booleans — enough surface for the reference
  * benchmark query shapes (`lucene/benchmark/conf/query-terms.txt`: term,
  * `a AND b`, `(a OR b) AND c`, negations).
  */
sealed trait Query extends Serializable {
  /** All terms referenced (for stats + block loading). */
  def terms: Set[String]
}

final case class TermQuery(term: String) extends Query {
  def terms: Set[String] = Set(term)
}

/** Multiple surface forms scored as one pseudo-term: summed per-doc tf, max
  * docFreq (ref `/root/reference/lucene/core/src/java/org/apache/lucene/search/SynonymQuery.java:54`
  * — "scores as if you had indexed all variants as one term").
  */
final case class SynonymQuery(synonyms: Seq[String]) extends Query {
  require(synonyms.nonEmpty)
  def terms: Set[String] = synonyms.toSet
  def key: String = synonyms.sorted.mkString("syn:", "|", "")
}

/** Score-multiplying wrapper (ref
  * `/root/reference/lucene/core/src/java/org/apache/lucene/search/BoostQuery.java`):
  * the wrapped query's weight is `boost * idf`, folded into the SimScorer at
  * weight-construction time exactly as the reference does (boost multiplies
  * inside the float weight, not as a post-hoc score multiply).
  */
final case class BoostQuery(query: Query, boost: Double) extends Query {
  def terms: Set[String] = query.terms
}

/** Disjunction scored by the BEST clause plus `tieBreaker` times the rest
  * (ref `/root/reference/lucene/core/src/java/org/apache/lucene/search/DisjunctionMaxQuery.java`
  * — the "dismax" combiner: prevents multi-field term stacking from
  * drowning the strongest field).
  */
final case class DisMaxQuery(disjuncts: Seq[Query], tieBreaker: Double = 0.0)
    extends Query {
  require(disjuncts.nonEmpty)
  def terms: Set[String] = disjuncts.iterator.flatMap(_.terms).toSet
}

/** Every match scores the constant `score` regardless of tf/idf (ref
  * `search/ConstantScoreQuery.java`).
  */
final case class ConstScoreQuery(query: Query, score: Double = 1.0) extends Query {
  def terms: Set[String] = query.terms
}

/** @param minimumShouldMatch docs must match at least this many SHOULD
  *   clauses (ref `search/BooleanQuery.java#getMinimumNumberShouldMatch`,
  *   scorer semantics `search/WANDScorer.java` minShouldMatch mode). 0 keeps
  *   the default: >=1 SHOULD when no MUST/FILTER present, else optional.
  */
final case class BoolQuery(
    clauses: Seq[(Query, Occur)],
    minimumShouldMatch: Int = 0
) extends Query {
  def terms: Set[String] = clauses.iterator.flatMap(_._1.terms).toSet
  def must: Seq[Query] = clauses.collect { case (q, Occur.Must) => q }
  def should: Seq[Query] = clauses.collect { case (q, Occur.Should) => q }
  def mustNot: Seq[Query] = clauses.collect { case (q, Occur.MustNot) => q }
  def filter: Seq[Query] = clauses.collect { case (q, Occur.Filter) => q }
}

object Query {
  def and(ts: String*): BoolQuery = BoolQuery(ts.map(t => TermQuery(t) -> (Occur.Must: Occur)))
  def or(ts: String*): BoolQuery = BoolQuery(ts.map(t => TermQuery(t) -> (Occur.Should: Occur)))

  /** Mini query parser for `a AND b`, `a OR b`, `NOT c`, parentheses, and
    * bare multi-term (implicit OR) — the subset the reference demo uses
    * (`lucene/queryparser/classic/QueryParser.java` surface, reduced).
    * Terms are analyzed with the same analyzer as indexing (the consistency
    * rule of `lucene/demo/.../SearchFiles.java:120`).
    */
  def parse(s: String, analyze: String => String = identity): Query = {
    val tokens = tokenize(s)
    val (q, rest) = parseOr(tokens, analyze)
    require(rest.isEmpty, s"dangling tokens: $rest")
    q
  }

  private def tokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(' || c == ')') { out += c.toString; i += 1 }
      else if (c.isWhitespace) i += 1
      else {
        val j0 = i
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace && s.charAt(j) != '(' && s.charAt(j) != ')') j += 1
        out += s.substring(j0, j)
        i = j
      }
    }
    out.toList
  }

  private def parseOr(ts: List[String], an: String => String): (Query, List[String]) = {
    var (left, rest) = parseAnd(ts, an)
    val shoulds = scala.collection.mutable.ListBuffer[Query](left)
    while (rest.headOption.exists(_.equalsIgnoreCase("OR"))) {
      val (r, rr) = parseAnd(rest.tail, an)
      shoulds += r
      rest = rr
    }
    if (shoulds.size == 1) (left, rest)
    else (BoolQuery(shoulds.toSeq.map(_ -> (Occur.Should: Occur))), rest)
  }

  private def parseAnd(ts: List[String], an: String => String): (Query, List[String]) = {
    var (left, rest) = parseNot(ts, an)
    val parts = scala.collection.mutable.ListBuffer[(Query, Occur)](left)
    var implicitOr = true
    while (rest.nonEmpty && !rest.head.equalsIgnoreCase("OR") && rest.head != ")") {
      val explicitAnd = rest.head.equalsIgnoreCase("AND")
      val ts2 = if (explicitAnd) rest.tail else rest
      if (explicitAnd) implicitOr = false
      val (r, rr) = parseNot(ts2, an)
      parts += r
      rest = rr
    }
    if (parts.size == 1) (parts.head._1, rest)
    else {
      val occ: Occur = if (implicitOr) Occur.Should else Occur.Must
      val clauses = parts.toSeq.map {
        case (q, Occur.MustNot) => q -> (Occur.MustNot: Occur)
        case (q, _)             => q -> occ
      }
      (BoolQuery(clauses), rest)
    }
  }

  private def parseNot(ts: List[String], an: String => String): ((Query, Occur), List[String]) =
    ts match {
      case h :: t if h.equalsIgnoreCase("NOT") || h == "-" =>
        val (q, rest) = parseAtom(t, an)
        ((q, Occur.MustNot), rest)
      case _ =>
        val (q, rest) = parseAtom(ts, an)
        ((q, Occur.Should), rest)
    }

  private def parseAtom(ts: List[String], an: String => String): (Query, List[String]) =
    ts match {
      case "(" :: t =>
        val (q, rest) = parseOr(t, an)
        require(rest.headOption.contains(")"), "missing )")
        (q, rest.tail)
      case h :: t =>
        // `term^2.5` = per-clause boost; `field:term` = field scope (ref
        // queryparser/classic syntax) — boost strips first, then field
        val caret = h.lastIndexOf('^')
        val (bare, boost) =
          if (caret > 0 && caret < h.length - 1 &&
              h.substring(caret + 1).matches("""\d+(\.\d+)?"""))
            (h.substring(0, caret), Some(h.substring(caret + 1).toDouble))
          else (h, None)
        val colon = bare.indexOf(':')
        val tq =
          if (colon > 0 && colon < bare.length - 1 &&
              bare.substring(0, colon).matches("[A-Za-z_][A-Za-z0-9_]*"))
            TermQuery(graft.index.FieldKey.encode(
              bare.substring(0, colon), an(bare.substring(colon + 1))))
          else TermQuery(an(bare))
        (boost.map(BoostQuery(tq, _)).getOrElse(tq: Query), t)
      case Nil    => throw new IllegalArgumentException("empty query")
    }
}
