package graft.corpus

/** Minimal HTML text extractor with the reference demo parser's rules
  * (semantics from
  * `/root/reference/lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/feeds/DemoHTMLParser.java:56-160`):
  * only body characters are kept, block elements contribute a newline
  * boundary, `script`/`style` contents are suppressed, `<img alt="x">` yields
  * its alt text, the `<title>` is prepended, and HTML entities are decoded.
  *
  * The corpus generator's [[render]] is the exact inverse:
  * `extract(render(title, paras)) == (title +: paras).mkString("\n")`
  * byte-for-byte — the per-url invariant required by BASELINE.json.
  */
object HtmlExtract {

  private val blockTags = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "tr", "td", "th", "table", "blockquote", "pre", "section", "article",
    "header", "footer", "title"
  )
  private val suppressTags = Set("script", "style")

  def render(title: String, paras: Seq[String], id: Long): String = {
    val sb = new StringBuilder(256)
    sb.append("<html><head><title>").append(escape(title))
      .append("</title><meta charset=\"utf-8\"><style>.c{color:red}</style></head><body>")
    paras.foreach(p => sb.append("<p>").append(escape(p)).append("</p>"))
    sb.append("<script>var page=").append(id).append(";track();</script></body></html>")
    sb.toString
  }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** Extract visible text; see object doc for the rules. */
  def extract(html: String): String = {
    val sb = new StringBuilder(html.length / 4)
    var i = 0
    val n = html.length
    var suppressed: String = null
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = html.indexOf('>', i)
        if (close < 0) { i = n }
        else {
          val inner = html.substring(i + 1, close).trim
          val isEnd = inner.startsWith("/")
          val body = if (isEnd) inner.substring(1) else inner
          val name = body.takeWhile(ch => ch.isLetterOrDigit).toLowerCase
          if (suppressed != null) {
            if (isEnd && name == suppressed) suppressed = null
          } else if (!isEnd && suppressTags.contains(name) && !inner.endsWith("/")) {
            suppressed = name
          } else if (name == "img") {
            val alt = attr(inner, "alt")
            if (alt.nonEmpty) sb.append(unescape(alt))
          } else if (blockTags.contains(name) && (isEnd || name == "br")) {
            if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
          }
          i = close + 1
        }
      } else {
        if (suppressed == null) sb.append(c)
        i += 1
      }
    }
    // trim trailing newline left by the final block close
    while (sb.nonEmpty && sb.charAt(sb.length - 1) == '\n') sb.setLength(sb.length - 1)
    unescape(sb.toString)
  }

  private def attr(tag: String, name: String): String = {
    val m = (name + "=\"").r.findFirstMatchIn(tag.toLowerCase)
    m match {
      case Some(mm) =>
        val start = mm.end
        val end = tag.indexOf('"', start)
        if (end > start) tag.substring(start, end) else ""
      case None => ""
    }
  }

  def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&amp;", "&")
}
