package graft.search

/** Mandatory literal prefix of an anchored regex — the syntactic
  * re-expression of the reference's automaton common prefix
  * (`lucene/core/src/java/org/apache/lucene/util/automaton/Operations.java`
  * `getCommonPrefix`, reached from `RegexpQuery` via `RunAutomaton`).
  *
  * Soundness contract: every string the anchored pattern matches is
  * guaranteed to start with the returned prefix, so the dictionary scan can
  * be bounded to the `[prefix, prefix+)` range (which reaches the Parquet
  * scan as PushedFilters on the term-sorted tables). Returns "" whenever no
  * prefix is mandatory: unanchored patterns, top-level alternation (Spark's
  * `rlike` does a *search*, so `^ab|cd` leaves the second branch
  * unanchored), or constructs the analyzer does not model (lookarounds,
  * backreferences, \Q quoting) — those degrade to the full-dictionary scan,
  * the reference's behavior for automata with no common prefix.
  *
  * Unlike a bare leading-literal walk, this factors shared prefixes out of
  * *grouped* alternations — `^(stream|strong)` → "str",
  * `^st(r|l)ong` → "st", `^ab(?:cd|ce)f` → "abc" — and models quantifiers
  * (an optional factor ends the prefix; a `+`/`{n≥1}` factor contributes
  * one mandatory occurrence).
  */
object RegexPrefix {

  def of(re: String): String = {
    if (!re.startsWith("^")) return ""
    // A '|' at paren depth 0 alternates the WHOLE pattern and rlike leaves
    // the later branches unanchored — no prefix is mandatory.
    if (hasTopLevelAlternation(re)) return ""
    alt(re, 1, inGroup = false)._1
  }

  /** True when an unescaped `|` occurs at paren depth 0 outside a char
    * class anywhere in the pattern.
    */
  def hasTopLevelAlternation(re: String): Boolean = {
    var i = 0; var depth = 0; var inClass = false
    while (i < re.length) {
      re.charAt(i) match {
        case '\\' => i += 1 // skip escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass => depth += 1
        case ')' if !inClass && depth > 0 => depth -= 1
        case '|' if !inClass && depth == 0 => return true
        case _ =>
      }
      i += 1
    }
    false
  }

  /** Parse an alternation (branches separated by depth-0 `|`) starting at
    * `start`; stops at the matching `)` when `inGroup`, else at end of
    * pattern. Returns (prefix, exact, posOfTerminator) where `exact` means
    * the sub-language is exactly the singleton {prefix}.
    */
  private def alt(re: String, start: Int, inGroup: Boolean): (String, Boolean, Int) = {
    var i = start
    var prefix: String = null
    var allExact = true
    var allEqual = true
    var first: String = null
    var more = true
    while (more) {
      val (p, ex, j) = concat(re, i, inGroup)
      if (prefix == null) { prefix = p; first = p }
      else { prefix = lcp(prefix, p); allEqual &&= (p == first) }
      allExact &&= ex
      i = j
      if (i < re.length && re.charAt(i) == '|') i += 1
      else more = false
    }
    (prefix, allExact && allEqual, i)
  }

  private def lcp(a: String, b: String): String = {
    var n = 0
    val m = math.min(a.length, b.length)
    while (n < m && a.charAt(n) == b.charAt(n)) n += 1
    a.substring(0, n)
  }

  /** Parse one concatenation branch: accumulate the mandatory literal
    * prefix factor by factor until a factor is inexact (class, dot,
    * optional/repeated, unmodeled construct), then skip the remainder of
    * the branch so the caller still sees the branch terminator.
    */
  private def concat(re: String, start: Int, inGroup: Boolean): (String, Boolean, Int) = {
    val sb = new StringBuilder
    var i = start
    var exact = true
    while (i < re.length) {
      val c = re.charAt(i)
      if (c == '|' || (c == ')' && inGroup)) return (sb.toString, exact, i)
      c match {
        case '(' =>
          var body = i + 1
          var known = true
          if (body < re.length && re.charAt(body) == '?') {
            if (body + 1 < re.length && re.charAt(body + 1) == ':') body += 2
            else known = false // lookaround / flags / atomic — unmodeled
          }
          if (!known) return closed(re, i, inGroup, sb)
          val (gp, gex, j) = alt(re, body, inGroup = true)
          if (j >= re.length || re.charAt(j) != ')') // malformed
            return closed(re, i, inGroup, sb)
          val (q, after) = quantifier(re, j + 1)
          q match {
            case Quant.None =>
              sb ++= gp
              if (gex) { i = after; exact &&= gex }
              else return closed(re, after, inGroup, sb)
            case Quant.Optional => return closed(re, after, inGroup, sb)
            case Quant.OneOrMore =>
              sb ++= gp; return closed(re, after, inGroup, sb)
          }
        case '[' =>
          // a char class admits >1 char (we don't special-case singletons):
          // contributes nothing mandatory, ends the prefix
          return closed(re, i, inGroup, sb)
        case '\\' if i + 1 < re.length =>
          val e = re.charAt(i + 1)
          if (e.isLetterOrDigit) return closed(re, i, inGroup, sb) // \d \w \b \1 \Q...
          val (q, after) = quantifier(re, i + 2)
          q match {
            case Quant.None      => sb += e; i = after
            case Quant.Optional  => return closed(re, after, inGroup, sb)
            case Quant.OneOrMore => sb += e; return closed(re, after, inGroup, sb)
          }
        case '.' | '^' | '$' | '*' | '+' | '?' | '{' | ')' | '\\' =>
          // dot, stray anchor/quantifier/paren, trailing backslash: the
          // factor admits more than one continuation (or is malformed) —
          // end the prefix here
          return closed(re, i, inGroup, sb)
        case lit =>
          val (q, after) = quantifier(re, i + 1)
          q match {
            case Quant.None      => sb += lit; i = after
            case Quant.Optional  => return closed(re, after, inGroup, sb)
            case Quant.OneOrMore => sb += lit; return closed(re, after, inGroup, sb)
          }
      }
    }
    (sb.toString, exact, i)
  }

  private object Quant extends Enumeration {
    val None, Optional, OneOrMore = Value
  }

  /** Classify the quantifier at `i` (if any): Optional when the factor may
    * be absent (`?`, `*`, `{0,…}`), OneOrMore when at least one occurrence
    * is mandatory but more are admitted (`+`, `{n≥1,…}`). Returns the
    * position after the quantifier (callers that keep accumulating only do
    * so for Quant.None, where after == i).
    */
  private def quantifier(re: String, i: Int): (Quant.Value, Int) = {
    if (i >= re.length) return (Quant.None, i)
    re.charAt(i) match {
      case '?' | '*' => (Quant.Optional, i + 1)
      case '+'       => (Quant.OneOrMore, i + 1)
      case '{' =>
        val close = re.indexOf('}', i)
        if (close < 0) return (Quant.None, i) // bare '{' — caller treats as malformed
        val digits = re.substring(i + 1, close).takeWhile(_.isDigit)
        if (digits.isEmpty) (Quant.None, i)
        else if (digits.toLong == 0L) (Quant.Optional, close + 1)
        else (Quant.OneOrMore, close + 1)
      case _ => (Quant.None, i)
    }
  }

  /** The prefix is complete (a factor was inexact): consume the rest of
    * this branch — tracking escapes, classes and nested groups — so the
    * caller lands exactly on its `|` / `)` terminator.
    */
  private def closed(
      re: String, from: Int, inGroup: Boolean, sb: StringBuilder
  ): (String, Boolean, Int) = {
    var i = from; var depth = 0; var inClass = false
    while (i < re.length) {
      re.charAt(i) match {
        case '\\' => i += 1
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass => depth += 1
        case ')' if !inClass =>
          if (depth == 0) {
            if (inGroup) return (sb.toString, false, i)
            // stray ')': malformed, just keep scanning
          } else depth -= 1
        case '|' if !inClass && depth == 0 => return (sb.toString, false, i)
        case _ =>
      }
      i += 1
    }
    (sb.toString, false, i)
  }
}
