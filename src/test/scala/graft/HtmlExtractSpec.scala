package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{Corpus, HtmlExtract}

/** Byte-identity invariant: extractor(html) == text per url (BASELINE.json
  * per-row invariant; extractor rules from the reference's DemoHTMLParser).
  */
class HtmlExtractSpec extends AnyFunSuite {

  test("render/extract round trip is byte-identical") {
    val title = "hello world"
    val paras = Seq("first para words", "second one", "a & b < c > d \"quoted\"")
    val html = HtmlExtract.render(title, paras, 7L)
    assert(HtmlExtract.extract(html) == (title +: paras).mkString("\n"))
  }

  test("script/style suppressed, img alt kept, br breaks") {
    val html = "<html><body><p>one</p><script>evil()</script>" +
      "<style>.x{}</style><p>two<br>three</p><img alt=\"pic words\"></body></html>"
    assert(HtmlExtract.extract(html) == "one\ntwo\nthree\npic words")
  }

  test("corpus pages satisfy the invariant for 500 seeded docs") {
    for (id <- 0L until 500L) {
      val p = Corpus.page(id)
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      assert(HtmlExtract.extract(html) == p.text, s"doc $id")
    }
  }

  test("corpus is deterministic and urls unique") {
    val a = Corpus.page(123L)
    val b = Corpus.page(123L)
    assert(a == b || (a.url == b.url && a.text == b.text && a.html.sameElements(b.html)))
    val urls = (0L until 1000L).map(Corpus.page(_).url).toSet
    assert(urls.size == 1000)
  }
}
