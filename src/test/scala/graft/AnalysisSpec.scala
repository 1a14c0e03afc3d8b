package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{StandardAnalyzer, Token}

/** Golden analysis fixtures (FIXTURES.md F2) pinning the StandardAnalyzer
  * contract: UAX#29-style breaks, codepoint lowercase, stopword position
  * preservation, 255-char chop.
  */
class AnalysisSpec extends AnyFunSuite with PropHelpers {

  private val an = StandardAnalyzer.Default
  private val en = StandardAnalyzer.English

  private def terms(a: StandardAnalyzer, s: String): Seq[String] = a.tokens(s).map(_.term)
  private def posTerms(a: StandardAnalyzer, s: String): Seq[(String, Int)] =
    a.tokens(s).map(t => (t.term, t.position))

  test("basic word breaks + lowercase") {
    assert(terms(an, "The Quick  Brown-Fox jumped!") ==
      Seq("the", "quick", "brown", "fox", "jumped"))
  }

  test("letters and digits join (WB9/WB10)") {
    assert(terms(an, "mp3 v2 abc123def x") == Seq("mp3", "v2", "abc123def", "x"))
  }

  test("apostrophe between letters stays (MidNumLet)") {
    assert(terms(an, "don't O'Neill can't") == Seq("don't", "o'neill", "can't"))
  }

  test("decimal point between digits stays, bare dots break") {
    assert(terms(an, "pi is 3.14 ... ok.") == Seq("pi", "is", "3.14", "ok"))
  }

  test("commas between digits stay, between letters break") {
    assert(terms(an, "1,000 a,b") == Seq("1,000", "a", "b"))
  }

  test("trailing/leading medials break") {
    assert(terms(an, "end. 'start' mid'") == Seq("end", "start", "mid"))
  }

  test("underscore joins (ExtendNumLet WB13)") {
    assert(terms(an, "snake_case _lead trail_ ___") ==
      Seq("snake_case", "_lead", "trail_"))
  }

  test("codepoint lowercase handles non-ASCII") {
    assert(terms(an, "Łódź ÉCOLE Straße") == Seq("łódź", "école", "straße"))
  }

  test("ideographs emit one token per codepoint") {
    assert(terms(an, "中文abc日") == Seq("中", "文", "abc", "日"))
  }

  test("positions: no stopwords → consecutive") {
    assert(posTerms(an, "one two three") == Seq(("one", 0), ("two", 1), ("three", 2)))
  }

  test("positions: removed stopwords leave gaps (FilteringTokenFilter)") {
    // "the" and "of" are in the English set
    assert(posTerms(en, "the end of days") == Seq(("end", 1), ("days", 3)))
  }

  test("default analyzer keeps stopwords (StandardAnalyzer default set is empty)") {
    assert(terms(an, "the end of days") == Seq("the", "end", "of", "days"))
  }

  test("255-codepoint chop with position accounting") {
    val long = "a" * 600
    val toks = an.tokens(long)
    assert(toks.map(_.term.length) == Seq(255, 255, 90))
    assert(toks.map(_.position) == Seq(0, 1, 2))
  }

  test("termFreqs counts and norm length after stop filtering") {
    val (freqs, len) = en.termFreqs("the cat and the hat cat")
    assert(len == 3) // cat hat cat
    assert(freqs.get("cat") == 2)
    assert(freqs.get("hat") == 1)
    assert(!freqs.containsKey("the"))
  }

  test("foreachTerm streams the same terms as tokens (hot-path equivalence)") {
    val samples = Seq(
      "The Quick  Brown-Fox jumped!", "don't O'Neill can't", "pi is 3.14 ... ok.",
      "1,000 a,b", "snake_case _lead trail_ ___", "中文abc日", "the end of days",
      "a" * 600, "", "  ", "x"
    )
    for (a <- Seq(an, en); s <- samples) {
      val streamed = scala.collection.mutable.ArrayBuffer[String]()
      a.foreachTerm(s)(streamed += _)
      assert(streamed.toSeq == a.tokens(s).map(_.term), s"input: ${s.take(30)}")
    }
  }

  test("random text: foreachTerm == tokens == termFreqs (property)") {
    import org.scalacheck.Gen
    val codepoint = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('\'', '.', ',', ';', ':', '_', '-', '!', '?', '\n', '\t'),
      1 -> Gen.oneOf('中', '文', 'の', 'É', 'ü', 'ß', 'Ω', '€', '’')
    )
    val genText = Gen.listOf(codepoint).map(_.mkString)
    forAll(genText, n = 200) { s =>
      for (a <- Seq(an, en)) {
        val toks = a.tokens(s)
        // streaming path emits the same term sequence
        val streamed = scala.collection.mutable.ArrayBuffer[String]()
        a.foreachTerm(s)(streamed += _)
        assert(streamed.toSeq == toks.map(_.term), s"input: ${s.take(40)}")
        // per-doc aggregation is consistent with the token stream
        val (freqs, length) = a.termFreqs(s)
        assert(length == toks.size)
        val expect = toks.groupBy(_.term).view.mapValues(_.size).toMap
        import scala.jdk.CollectionConverters._
        assert(freqs.asScala.toMap.map { case (k, v) => k -> v.toInt } == expect)
        // positions strictly increase; offsets are sane
        toks.sliding(2).foreach {
          case Seq(x, y) => assert(x.position < y.position)
          case _ =>
        }
        toks.foreach(t => assert(t.startOffset >= 0 && t.endOffset <= s.length &&
          t.startOffset < t.endOffset))
      }
    }
  }

  test("offsets point into the source") {
    val toks = an.tokens("ab Cd")
    assert(toks == Vector(Token("ab", 0, 0, 2), Token("cd", 1, 3, 5)))
  }

  test("CJK bigrams: runs emit overlapping bigrams at consecutive positions") {
    val cjk = new StandardAnalyzer(cjkBigrams = true)
    // 3-char Han run -> two bigrams; Latin words pass through unchanged
    assert(cjk.tokens("web 数据库 x") == Vector(
      Token("web", 0, 0, 3),
      Token("数据", 1, 4, 6), Token("据库", 2, 5, 7),
      Token("x", 3, 8, 9)))
    // lone CJK char -> unigram (CJKBigramFilter's isolated-char behavior)
    assert(cjk.tokens("a 数 b").map(_.term) == Vector("a", "数", "b"))
    // Katakana and Hangul runs bigram too (HAN|HIRAGANA|KATAKANA|HANGUL)
    assert(cjk.tokens("データ").map(_.term) == Vector("デー", "ータ"))
    assert(cjk.tokens("한국어").map(_.term) == Vector("한국", "국어"))
    // mixed Han+Hiragana run bigrams across the script change (shared
    // buffer, like the reference filter)
    assert(cjk.tokens("数の字").map(_.term) == Vector("数の", "の字"))
    // hot-path equivalence holds in bigram mode
    val s = "web 数据库 データ 한국어 mixed 数"
    val streamed = Vector.newBuilder[String]
    cjk.foreachTerm(s)(streamed += _)
    assert(streamed.result() == cjk.tokens(s).map(_.term))
    // default mode unchanged: per-codepoint ideographs, Katakana as a word
    assert(an.tokens("数据库").map(_.term) == Vector("数", "据", "库"))
    assert(an.tokens("データ").map(_.term).size == 1)
  }

  test("ICU-style fold: width + accent + case collapse") {
    import graft.analysis.IcuFolding
    assert(IcuFolding("ＡＢＣ") == "abc")        // fullwidth Latin
    assert(IcuFolding("ｶﾀｶﾅ") == "カタカナ")    // halfwidth Katakana
    assert(IcuFolding("café") == "cafe")         // accent
    assert(IcuFolding("Ｃａｆé５") == "cafe5")  // width + accent + digit
    assert(IcuFolding("plain") == "plain")       // ASCII: untouched
  }
}
