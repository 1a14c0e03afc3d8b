package graft.search

import scala.collection.mutable.ListBuffer

/** The end-user query syntax of the reference's
  * `/root/reference/lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/SimpleQueryParser.java`,
  * re-expressed: a parser that NEVER throws — malformed input degrades to
  * whatever literal terms it contains (the reference's design contract for
  * end-user-facing search boxes).
  *
  * Syntax (all features enabled):
  *   - whitespace joins clauses with the default operator (OR, as in the
  *     reference; `defaultAnd = true` flips it),
  *   - `+` joins with AND and binds tighter than `|` (OR) —
  *     `a | b + c` parses as `a OR (b AND c)`,
  *   - `-` before an atom negates it; a negation raised at the top of an
  *     OR list attaches as MUST_NOT to the enclosing boolean (`a | -b`
  *     matches a-docs without b — the reference's flat-boolean shape),
  *   - `"a b"` phrase, `"a b"~N` sloppy phrase,
  *   - `term*` prefix, `term~N` fuzzy (N capped at 2, bare `~` = 2),
  *   - `(...)` grouping, `\x` escapes the syntax character x,
  *   - unbalanced quotes/parens and dangling operators never error: an
  *     unclosed quote runs to end-of-string, an unclosed group closes at
  *     end-of-string, dangling operators drop.
  *
  * `-` is an operator only at an atom boundary: `state-of-art` stays one
  * term, `a -b` negates b.
  */
object SimpleParser {

  def parse(
      s: String,
      analyze: String => String = identity,
      rewrite: MultiTerm => Query = Query.noRewrite,
      defaultAnd: Boolean = false
  ): Query = {
    val toks = tokenize(s)
    val p = new P(toks, analyze, rewrite, defaultAnd)
    val q = p.parseOr()
    Query.rewrite(q)
  }

  // ----------------------------------------------------------- tokens

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object OrSep extends Tok
  private case object AndSep extends Tok
  private case object Neg extends Tok
  private final case class Phrase(terms: Seq[String], slop: Int) extends Tok
  private final case class Word(text: String, prefix: Boolean, fuzzy: Option[Int])
    extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = ListBuffer[Tok]()
    var i = 0
    def slopAt(j0: Int): (Int, Int) = { // (slop, next index) for ~N at j0
      var j = j0
      if (j < s.length && s.charAt(j) == '~') {
        j += 1
        val d0 = j
        while (j < s.length && s.charAt(j).isDigit) j += 1
        val n = if (j > d0) s.substring(d0, j).toInt else 2
        (n, j)
      } else (-1, j0)
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else c match {
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '|' => out += OrSep; i += 1
        case '+' => out += AndSep; i += 1
        case '-' => out += Neg; i += 1
        case '"' =>
          val close = Query.indexOfUnescaped(s, '"', i + 1)
          val end = if (close < 0) s.length else close
          val body = Query.unescape(s.substring(i + 1, end))
          val (slop, next) = slopAt(if (close < 0) s.length else close + 1)
          out += Phrase(body.split("\\s+").filter(_.nonEmpty).toSeq,
            math.max(slop, 0))
          i = next
        case _ =>
          val j0 = i
          var j = i
          var stop = false
          while (j < s.length && !stop) {
            val cj = s.charAt(j)
            if (cj == '\\' && j + 1 < s.length) j += 2
            else if (cj.isWhitespace || "()|+\"~".contains(cj)) stop = true
            else j += 1
          }
          var text = s.substring(j0, j)
          val (fz, next) = slopAt(j)
          val prefix = fz < 0 && text.endsWith("*") && !text.endsWith("\\*")
          if (prefix) text = text.dropRight(1)
          out += Word(Query.unescape(text), prefix,
            if (fz >= 0) Some(math.min(fz, 2)) else None) // edits cap at 2
          i = next
      }
    }
    out.toList
  }

  // ----------------------------------------------------------- parser

  private final class P(var toks: List[Tok], an: String => String,
      rw: MultiTerm => Query, defaultAnd: Boolean) {

    private def peek: Option[Tok] = toks.headOption
    private def advance(): Unit = toks = toks.tail

    /** or := andRun (('|' | implicit) andRun)* — returns the flat boolean. */
    def parseOr(depth: Int = 0): Query = {
      val clauses = ListBuffer[(Query, Occur)]()
      var done = false
      while (!done) {
        peek match {
          case None => done = true
          case Some(RParen) =>
            advance() // group close; a stray ')' at top level just drops
            if (depth > 0) done = true
          case Some(OrSep) | Some(AndSep) => advance() // dangling separator
          case _ =>
            val (pos, neg) = parseAndRun()
            if (pos.nonEmpty) {
              val base =
                if (pos.sizeIs == 1 && neg.isEmpty) pos.head
                else BoolQuery(pos.map(_ -> (Occur.Must: Occur)) ++
                  neg.map(_ -> (Occur.MustNot: Occur)))
              clauses += base -> Occur.Should
            } else
              neg.foreach(n => clauses += n -> Occur.MustNot) // raised negation
        }
      }
      clauses.toList match {
        case Nil                   => MatchNoneQuery
        case (q, Occur.Should) :: Nil => q
        case cs                    => BoolQuery(cs)
      }
    }

    /** One AND run: atoms joined by `+` (or by whitespace when the default
      * operator is AND). Returns (positive, negated) member queries.
      */
    private def parseAndRun(): (List[Query], List[Query]) = {
      val pos = ListBuffer[Query]()
      val neg = ListBuffer[Query]()
      var more = true
      while (more) {
        var negate = false
        while (peek.contains(Neg)) { negate = true; advance() }
        peek match {
          case None | Some(RParen) | Some(OrSep) => more = false
          case Some(AndSep) => advance() // dangling '+' inside the run
          case Some(t) =>
            advance()
            atomQuery(t).foreach(q => if (negate) neg += q else pos += q)
            // join decision: explicit '+' (or any following atom when AND
            // is the default) continues the run
            peek match {
              case Some(AndSep)                      => advance()
              case Some(Neg) | Some(LParen) | Some(Phrase(_, _)) |
                   Some(Word(_, _, _)) if defaultAnd => ()
              case _                                 => more = false
            }
        }
      }
      (pos.toList, neg.toList)
    }

    private def atomQuery(t: Tok): Option[Query] = t match {
      case LParen =>
        val q = parseOr(depth = 1) // consumes the matching ')' (or EOS)
        if (q == MatchNoneQuery) None else Some(q)
      case Phrase(raw, slop) =>
        val terms = raw.map(an)
        terms match {
          case Seq()  => None
          case Seq(t) => Some(TermQuery(t))
          case ts     => Some(PhraseQuery(ts, slop))
        }
      case Word(text, _, _) if text.isEmpty => None
      case Word(text, true, _)              => Some(rw(MultiTerm.Prefix(an(text))))
      case Word(text, false, Some(n)) if n <= 0 => Some(TermQuery(an(text)))
      case Word(text, false, Some(n))       => Some(rw(MultiTerm.Fuzzy(an(text), n)))
      case Word(text, false, None)          => Some(TermQuery(an(text)))
      case _                                => None // separators never reach here
    }
  }
}
