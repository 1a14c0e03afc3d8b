package graft.search

/** Surround query language — the reference's proximity-first parser
  * (`/root/reference/lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/parser/QueryParser.jj`):
  * boolean operators compose with explicit distance operators,
  *
  *   - `AND(a, b)` / `a AND b` — conjunction
  *   - `OR(a, b)` / `a OR b` — disjunction
  *   - `NOT(a, b)` / `a NOT b` — a minus b
  *   - `3W(a, b)` / `a 3W b` — ordered within distance 3 (`W` = 1)
  *   - `3N(a, b)` / `a 3N b` — unordered within distance 3 (`N` = 1)
  *   - terms may carry `*` / `?` wildcards; parens group; operators are
  *     case-insensitive; infix precedence loosest→tightest OR, AND, NOT,
  *     N, W (the reference grammar's production nesting).
  *
  * Distance operators map onto the intervals algebra (the repo's span
  * replacement): `nW(c₁..c_k)` = `MaxWidth(Ordered(c₁..c_k), n + k − 1)` —
  * the reference rewrites to `SpanNearQuery(slop = n − 1)`, whose matching
  * span covers at most `k + slop` positions — and `nN` the same over
  * `Unordered`. A distance node at the top level becomes a scored
  * [[IntervalQuery]]; boolean nodes become [[BoolQuery]]. `AND`/`NOT`
  * inside a distance operator is rejected, as in the reference grammar
  * (only terms, OR, and nested distance ops can be span clauses). A
  * wildcard with no dictionary matches collapses its enclosing clause to
  * [[MatchNoneQuery]].
  */
object SurroundParser {

  /** @param analyzeOne  single-term analysis (lowercase etc.)
    * @param expand      dictionary expansion for a wildcard pattern
    */
  def parse(input: String, analyzeOne: String => String,
            expand: String => Seq[String]): Query = {
    val p = new P(lex(input), analyzeOne, expand)
    val node = p.parseLevel(0)
    p.expectEnd()
    toQuery(node, analyzeOne, expand)
  }

  // ----------------------------------------------------------- lexer

  private final case class Tok(s: String, kind: Int) // 0 word, 1 punct
  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')' || c == ',') {
        out += Tok(c.toString, 1); i += 1
      } else {
        val j0 = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
          s.charAt(i) != '(' && s.charAt(i) != ')' && s.charAt(i) != ',') i += 1
        out += Tok(s.substring(j0, i), 0)
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- AST

  private sealed trait Node
  private final case class TermNode(raw: String) extends Node
  private final case class BoolNode(op: String, args: Seq[Node]) extends Node
  private final case class DistNode(n: Int, ordered: Boolean, args: Seq[Node])
      extends Node

  private val DistRe = "^([0-9]*)([WwNn])$".r

  /** (operator token → precedence level); parseLevel(l) binds ops with
    * precedence >= l on its operands.
    */
  private def opOf(t: Tok): Option[(Node => Node => Node, Int)] =
    if (t.kind != 0) None
    else t.s.toUpperCase(java.util.Locale.ROOT) match {
      case "OR"  => Some((a => b => BoolNode("OR", Seq(a, b)), 1))
      case "AND" => Some((a => b => BoolNode("AND", Seq(a, b)), 2))
      case "NOT" => Some((a => b => BoolNode("NOT", Seq(a, b)), 3))
      case DistRe(d, wn) =>
        val n = if (d.isEmpty) 1 else d.toInt
        val ord = wn.equalsIgnoreCase("W")
        Some((a => b => DistNode(n, ord, Seq(a, b)), if (ord) 5 else 4))
      case _ => None
    }

  private final class P(toks: Vector[Tok], analyzeOne: String => String,
                        expand: String => Seq[String]) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    private def next(): Tok = {
      require(i < toks.length, "unexpected end of query")
      val t = toks(i); i += 1; t
    }

    def expectEnd(): Unit =
      require(i == toks.length, s"trailing input at token ${toks(i).s}")

    /** Precedence climbing over infix operators. */
    def parseLevel(level: Int): Node = {
      var left = primary()
      var continue = true
      while (continue) {
        peek.flatMap(opOf) match {
          case Some((mk, prec)) if prec >= level =>
            next()
            val right = parseLevel(prec + 1) // left-assoc
            left = mk(left)(right)
          case _ => continue = false
        }
      }
      left
    }

    private def primary(): Node = {
      val t = peek.getOrElse(throw new IllegalArgumentException("empty query"))
      if (t.kind == 1 && t.s == "(") {
        next()
        val inner = parseLevel(0)
        val close = next()
        require(close.s == ")", s"expected ) got ${close.s}")
        inner
      } else if (t.kind == 0) {
        // prefix form: OP ( args , ... )
        val asOp = t.s.toUpperCase(java.util.Locale.ROOT) match {
          case "OR" | "AND" | "NOT" => Some(t.s.toUpperCase(java.util.Locale.ROOT))
          case DistRe(_, _)         => Some(t.s)
          case _                    => None
        }
        if (asOp.isDefined && i + 1 < toks.length && toks(i + 1).s == "(") {
          next(); next() // op + (
          val args = Seq.newBuilder[Node]
          args += parseLevel(0)
          while (peek.exists(_.s == ",")) { next(); args += parseLevel(0) }
          val close = next()
          require(close.s == ")", s"expected ) got ${close.s}")
          asOp.get match {
            case "OR"  => BoolNode("OR", args.result())
            case "AND" => BoolNode("AND", args.result())
            case "NOT" => BoolNode("NOT", args.result())
            case DistRe(d, wn) =>
              val n = if (d.isEmpty) 1 else d.toInt
              DistNode(n, wn.equalsIgnoreCase("W"), args.result())
          }
        } else { next(); TermNode(t.s) }
      } else throw new IllegalArgumentException(s"unexpected ${t.s}")
    }
  }

  // ------------------------------------------------- AST -> Query

  private def isWildcard(s: String): Boolean =
    s.exists(c => c == '*' || c == '?')

  private def toQuery(n: Node, analyzeOne: String => String,
                      expand: String => Seq[String]): Query = n match {
    case TermNode(raw) =>
      if (isWildcard(raw)) {
        val ts = expand(raw.toLowerCase(java.util.Locale.ROOT))
        if (ts.isEmpty) MatchNoneQuery else Query.or(ts: _*)
      } else TermQuery(analyzeOne(raw))
    case BoolNode("OR", args) =>
      BoolQuery(args.map(a => toQuery(a, analyzeOne, expand) -> Occur.Should))
    case BoolNode("AND", args) =>
      BoolQuery(args.map(a => toQuery(a, analyzeOne, expand) -> Occur.Must))
    case BoolNode("NOT", args) =>
      BoolQuery((toQuery(args.head, analyzeOne, expand) -> Occur.Must) +:
        args.tail.map(a => toQuery(a, analyzeOne, expand) -> Occur.MustNot))
    case BoolNode(op, _) =>
      throw new IllegalArgumentException(s"unknown op $op")
    case d: DistNode =>
      toSource(d, analyzeOne, expand) match {
        case Some(src) => IntervalQuery(src)
        case None      => MatchNoneQuery
      }
  }

  /** None = a wildcard clause expanded to nothing (unmatchable). */
  private def toSource(n: Node, analyzeOne: String => String,
                       expand: String => Seq[String]): Option[Intervals.Source] =
    n match {
      case TermNode(raw) =>
        if (isWildcard(raw)) {
          val ts = expand(raw.toLowerCase(java.util.Locale.ROOT))
          if (ts.isEmpty) None
          else if (ts.sizeIs == 1) Some(Intervals.Term(ts.head))
          else Some(Intervals.Or(ts.map(Intervals.Term)))
        } else Some(Intervals.Term(analyzeOne(raw)))
      case BoolNode("OR", args) =>
        val srcs = args.map(toSource(_, analyzeOne, expand))
        val kept = srcs.flatten
        if (kept.isEmpty) None
        else if (kept.sizeIs == 1) Some(kept.head)
        else Some(Intervals.Or(kept))
      case BoolNode(op, _) =>
        throw new IllegalArgumentException(
          s"$op cannot appear inside a distance operator (surround grammar)")
      case DistNode(dist, ordered, args) =>
        val srcs = args.map(toSource(_, analyzeOne, expand))
        if (srcs.exists(_.isEmpty)) None
        else {
          val ch = srcs.flatten
          val inner =
            if (ordered) Intervals.Ordered(ch) else Intervals.Unordered(ch)
          // distance N == SpanNearQuery(slop = N - 1) in the reference
          // (`queryparser/surround/query/DistanceQuery.java`): the allowed
          // extent is slop plus the SUM of the children's minimal extents —
          // a nested distance child occupies >= its own width, so using
          // ch.size here would make 'a N (b W c)' unmatchable
          val width = dist - 1 + ch.map(Intervals.minExtent).sum
          Some(Intervals.MaxWidth(inner, width))
        }
    }
}
