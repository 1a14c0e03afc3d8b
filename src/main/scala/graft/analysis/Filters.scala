package graft.analysis

/** A per-term transformation applied at the tail of the analysis chain,
  * after lowercasing and stop filtering — the re-expression of the
  * reference's `TokenFilter` pipeline for stateless term rewrites
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/analysis/TokenFilter.java`).
  * Stateful stream transforms (shingles) are column ops in
  * [[graft.pipeline.TextOps]] instead — at 100 TB the n-gram expansion is a
  * codegen'd scan, not a per-token object pipeline.
  */
trait TermFilter extends Serializable {
  def apply(term: String): String
}

object TermFilter {

  /** No-op filter: the default analysis chain. */
  object Identity extends TermFilter {
    override def apply(term: String): String = term
  }

  /** Resolves a filter by config name. Filters are singletons so a name
    * string (not a closure) travels through [[graft.index.IndexConfig]]
    * into executor-side analyzer construction.
    */
  def byName(name: String): TermFilter = name match {
    case "" | "none" => Identity
    case "minimal" => EnglishMinimalStemmer
    case "porter" => PorterStemmer
    case "fold" => AsciiFolding
    case "icufold" => IcuFolding
    case other =>
      throw new IllegalArgumentException(
        s"unknown term filter '$other' (expected none|minimal|porter|fold|icufold)")
  }
}

/** English plural stripping — Harman's S-stemmer, with the exact rule set of
  * the reference's minimal stemmer
  * (`/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishMinimalStemFilter.java`;
  * Donna Harman, "How Effective Is Suffixing?", JASIS 42(1), 1991).
  * Disclosed exact-semantics re-statement (a ~10-line rule table, like
  * `codec/SmallFloat`): the SQL oracle for `text_stem_minimal` replicates
  * the same CASE tree independently in DuckDB.
  *
  * Rules: words shorter than 3 or not ending in `s` are unchanged; `-us`
  * and `-ss` are kept; `-ies` becomes `-y` unless preceded by `a`/`e`;
  * other `-[iaou]es` are kept; any other trailing `s` is dropped.
  */
object EnglishMinimalStemmer extends TermFilter {
  override def apply(t: String): String = {
    val n = t.length
    if (n < 3 || t.charAt(n - 1) != 's') t
    else
      t.charAt(n - 2) match {
        case 'u' | 's' => t
        case 'e' =>
          if (n > 3 && t.charAt(n - 3) == 'i' &&
            t.charAt(n - 4) != 'a' && t.charAt(n - 4) != 'e')
            t.substring(0, n - 3) + "y"
          else if (t.charAt(n - 3) == 'i' || t.charAt(n - 3) == 'a' ||
            t.charAt(n - 3) == 'o' || t.charAt(n - 3) == 'u') t
          else t.substring(0, n - 1)
        case _ => t.substring(0, n - 1)
      }
  }
}

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980) — fresh implementation from the paper,
  * adopting the reference's two documented departures (`bli`→`ble` instead
  * of `abli`→`able`, and the added `logi`→`log` rule) for parity with
  * `/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemFilter.java`.
  *
  * Only pure lowercase-ASCII letter runs are stemmed (the analyzer has
  * already lowercased); terms with digits or non-ASCII letters pass
  * through unchanged.
  */
object PorterStemmer extends TermFilter {

  override def apply(term: String): String = {
    val n = term.length
    if (n <= 2) return term
    var i = 0
    while (i < n) {
      val c = term.charAt(i)
      if (c < 'a' || c > 'z') return term
      i += 1
    }
    val buf = new Array[Char](n + 4) // suffix rewrites may grow by one
    term.getChars(0, n, buf, 0)
    val end = run(buf, n)
    // same-length rewrites (y->i, equal-width setTo) still change content
    val out = new String(buf, 0, end)
    if (out == term) term else out
  }

  /** Runs all five steps on `buf[0, len)`; returns the new end. */
  private def run(buf: Array[Char], len: Int): Int = {
    val s = new State(buf, len)
    s.step1a(); s.step1b(); s.step1c()
    s.step2(); s.step3(); s.step4(); s.step5()
    s.end
  }

  private final class State(val buf: Array[Char], var end: Int) {

    /** Stem end index set by the last successful [[ends]] call. */
    private var j = 0

    private def isConsonant(i: Int): Boolean = buf(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !isConsonant(i - 1)
      case _ => true
    }

    /** Porter's measure m of the stem `buf[0, k]`: the number of VC
      * sequences in `[C](VC)^m[V]`.
      */
    private def m(k: Int): Int = {
      var n = 0
      var i = 0
      while (i <= k && isConsonant(i)) i += 1
      while (i <= k) {
        while (i <= k && !isConsonant(i)) i += 1
        if (i > k) return n
        n += 1
        while (i <= k && isConsonant(i)) i += 1
      }
      n
    }

    private def vowelInStem(k: Int): Boolean = {
      var i = 0
      while (i <= k) {
        if (!isConsonant(i)) return true
        i += 1
      }
      false
    }

    /** *d — stem ends in a double consonant. */
    private def doubleC(k: Int): Boolean =
      k >= 1 && buf(k) == buf(k - 1) && isConsonant(k)

    /** *o — stem ends consonant-vowel-consonant, final not w/x/y. */
    private def cvc(k: Int): Boolean =
      k >= 2 && isConsonant(k) && !isConsonant(k - 1) && isConsonant(k - 2) &&
        buf(k) != 'w' && buf(k) != 'x' && buf(k) != 'y'

    private def ends(suffix: String): Boolean = {
      val l = suffix.length
      if (l > end) return false
      var i = 0
      while (i < l) {
        if (buf(end - l + i) != suffix.charAt(i)) return false
        i += 1
      }
      j = end - l - 1
      true
    }

    /** Replaces the suffix matched by the last [[ends]] with `s`. */
    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        buf(j + 1 + i) = s.charAt(i)
        i += 1
      }
      end = j + 1 + s.length
    }

    /** Rewrites the matched suffix to `s` when the stem has m > 0. */
    private def r(s: String): Unit = if (m(j) > 0) setTo(s)

    /** sses→ss, ies→i, ss→ss, s→(removed). */
    def step1a(): Unit =
      if (buf(end - 1) == 's') {
        if (ends("sses")) end -= 2
        else if (ends("ies")) setTo("i")
        else if (buf(end - 2) != 's') end -= 1
      }

    /** (m>0) eed→ee; (*v*) ed/ing removed with at/bl/iz, double-consonant,
      * and cvc+e cleanup.
      */
    def step1b(): Unit =
      if (ends("eed")) {
        if (m(j) > 0) end -= 1
      } else if ((ends("ed") || ends("ing")) && vowelInStem(j)) {
        end = j + 1
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(end - 1)) {
          val c = buf(end - 1)
          if (c != 'l' && c != 's' && c != 'z') end -= 1
        } else if (m(end - 1) == 1 && cvc(end - 1)) {
          buf(end) = 'e'
          end += 1
        }
      }

    /** (*v*) y→i. */
    def step1c(): Unit =
      if (ends("y") && vowelInStem(j)) buf(end - 1) = 'i'

    /** Double-suffix reductions (m>0). Longer suffixes are tried before
      * their own suffixes (ational before tional, ization before ation).
      */
    def step2(): Unit =
      if (end > 3) {
        if (ends("ational")) r("ate")
        else if (ends("tional")) r("tion")
        else if (ends("enci")) r("ence")
        else if (ends("anci")) r("ance")
        else if (ends("izer")) r("ize")
        else if (ends("bli")) r("ble")
        else if (ends("alli")) r("al")
        else if (ends("entli")) r("ent")
        else if (ends("eli")) r("e")
        else if (ends("ousli")) r("ous")
        else if (ends("ization")) r("ize")
        else if (ends("ation")) r("ate")
        else if (ends("ator")) r("ate")
        else if (ends("alism")) r("al")
        else if (ends("iveness")) r("ive")
        else if (ends("fulness")) r("ful")
        else if (ends("ousness")) r("ous")
        else if (ends("aliti")) r("al")
        else if (ends("iviti")) r("ive")
        else if (ends("biliti")) r("ble")
        else if (ends("logi")) r("log")
      }

    /** ic-/ful-/ness-family reductions (m>0). */
    def step3(): Unit =
      if (end > 3) {
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
        else if (ends("iciti")) r("ic")
        else if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
        else if (ends("ness")) r("")
      }

    /** Suffix deletion in m>1 stems; ion only after s/t. */
    def step4(): Unit =
      if (end > 3) {
        val matched =
          ends("ement") || ends("ment") || ends("ent") ||
            ends("ance") || ends("ence") || ends("able") || ends("ible") ||
            ends("ant") || ends("ism") || ends("ate") || ends("iti") ||
            ends("ous") || ends("ive") || ends("ize") || ends("ou") ||
            ends("er") || ends("ic") || ends("al") ||
            (ends("ion") && j >= 0 && (buf(j) == 's' || buf(j) == 't'))
        if (matched && m(j) > 1) end = j + 1
      }

    /** 5a: drop final e when m>1, or m=1 and not *o; 5b: ll→l when m>1. */
    def step5(): Unit = {
      if (buf(end - 1) == 'e') {
        val a = m(end - 2)
        if (a > 1 || (a == 1 && !cvc(end - 2))) end -= 1
      }
      if (buf(end - 1) == 'l' && doubleC(end - 1) && m(end - 2) > 1) end -= 1
    }
  }
}

/** Accent folding: canonical decomposition (NFD) with combining marks
  * dropped — the diacritic subset of the reference's folding filter
  * (`/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/ASCIIFoldingFilter.java`;
  * the reference's full table also maps non-decomposable ligatures like
  * `ß`/`æ`, which pass through here — documented subset). The
  * `text_fold` oracle cross-checks against DuckDB's independent
  * `strip_accents`.
  */
object AsciiFolding extends TermFilter {
  override def apply(t: String): String = {
    var i = 0
    while (i < t.length) {
      if (t.charAt(i) >= 0x80) {
        val d = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(d.length)
        var k = 0
        while (k < d.length) {
          val c = d.charAt(k)
          if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
          k += 1
        }
        return sb.toString
      }
      i += 1
    }
    t // pure ASCII: no allocation
  }
}

/** ICU-style fold — the behavior core of the reference's
  * `analysis/icu/.../ICUFoldingFilter.java` (ICU UTR#30 foldings) on JDK
  * primitives: NFKC compatibility normalization (fullwidth ASCII `ＡＢＣ` →
  * `abc`, halfwidth Katakana `ｶﾀ` → `カタ`, ligature/compatibility forms
  * decomposed), then accent-mark removal (NFD, combining marks dropped),
  * then codepoint lowercase — so width variants, accents, and case all
  * collapse to one indexed form. The ICU library's full UTR#30 table covers
  * more scripts' specials (documented subset); the web-relevant width +
  * accent + case classes are exact.
  */
object IcuFolding extends TermFilter {
  override def apply(t: String): String = {
    var i = 0
    while (i < t.length && t.charAt(i) < 0x80) i += 1
    if (i == t.length) return t // pure ASCII (already lowercased upstream)
    val kc = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFKC)
    val d = java.text.Normalizer.normalize(kc, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var k = 0
    while (k < d.length) {
      val cp = d.codePointAt(k)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(Character.toLowerCase(cp))
      k += Character.charCount(cp)
    }
    sb.toString
  }
}
