package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style web page — the engine's input row shape
  * (BASELINE.json input hint: url, warc_ts, html, text, lang).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Deterministic synthetic web-page corpus (FIXTURES.md F1).
  *
  * Every page is generated independently from `mix(seed, id)` so generation is
  * embarrassingly parallel — at 10^12 docs this is `spark.range(n)` + a narrow
  * `map`, no shuffle, no driver state. The `html` is rendered from `text` by a
  * fixed template whose extraction rules ([[HtmlExtract]]) invert it exactly,
  * giving the per-url byte-identity invariant `extract(html) == text`.
  *
  * Term distribution is Zipfian over a ~30k-term vocabulary with explicit head
  * terms (including English stopwords) to force the skew/salting paths the
  * north rule calls out.
  */
object Corpus {

  val DefaultSeed = 42L

  // ------------------------------------------------------------ vocabulary

  /** Head of the distribution: high-frequency terms, incl. stopwords. */
  private val headWords: Array[String] = Array(
    "the", "of", "and", "to", "a", "in", "is", "that", "for", "it", "was",
    "on", "are", "as", "with", "be", "at", "by", "this", "from", "or", "had",
    "not", "but", "they", "court", "law", "state", "time", "page", "new",
    "data", "web", "site", "news", "world", "year", "people", "government",
    "system", "information"
  )

  private val consonants = "bcdfghjklmnpqrstvwz"
  private val vowels = "aeiou"

  /** Injective syllable word for rank i: alternating consonant/vowel digits. */
  private def synthWord(i0: Int): String = {
    val sb = new StringBuilder
    var i = i0
    do {
      sb.append(consonants.charAt(i % consonants.length))
      i /= consonants.length
      sb.append(vowels.charAt(i % vowels.length))
      i /= vowels.length
    } while (i > 0)
    sb.toString
  }

  val VocabSize = 30000

  /** vocab(rank) — head words first, then synthetic syllable words. */
  lazy val vocab: Array[String] = {
    val out = new Array[String](VocabSize)
    System.arraycopy(headWords, 0, out, 0, headWords.length)
    var i = headWords.length
    var j = 0
    val seen = scala.collection.mutable.HashSet[String](headWords.toIndexedSeq: _*)
    while (i < VocabSize) {
      val w = synthWord(j)
      if (!seen.contains(w)) { out(i) = w; seen += w; i += 1 }
      j += 1
    }
    out
  }

  /** Zipf(s=1.07) cumulative distribution over vocab ranks. */
  private lazy val zipfCdf: Array[Double] = {
    val s = 1.07
    val w = Array.tabulate(VocabSize)(r => 1.0 / math.pow(r + 1.0, s))
    val total = w.sum
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(VocabSize - 1) = 1.0
    cdf
  }

  private def sampleRank(u: Double): Int = {
    val idx = java.util.Arrays.binarySearch(zipfCdf, u)
    if (idx >= 0) idx else math.min(-idx - 1, VocabSize - 1)
  }

  // ------------------------------------------------------------ rng

  /** splitmix64 — deterministic per-doc stream independent of partitioning. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state = mix(state); state }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
  }

  private val Epoch = 1704067200000L // 2024-01-01T00:00:00Z

  // ------------------------------------------------------------ generation

  def page(id: Long, seed: Long = DefaultSeed): Page = {
    val rng = new Rng(mix(seed) ^ mix(id))
    // log-uniform doc length in [10, 2000) tokens
    val nTokens = (10 * math.exp(rng.nextDouble() * math.log(200.0))).toInt
    val words = new Array[String](nTokens)
    var i = 0
    while (i < nTokens) { words(i) = vocab(sampleRank(rng.nextDouble())); i += 1 }
    val titleLen = 2 + rng.nextInt(5)
    val title = words.take(math.min(titleLen, nTokens)).mkString(" ")
    // body: paragraphs of 20-80 words
    val paras = scala.collection.mutable.ArrayBuffer[String]()
    var p = math.min(titleLen, nTokens)
    while (p < nTokens) {
      val len = math.min(20 + rng.nextInt(61), nTokens - p)
      paras += words.slice(p, p + len).mkString(" ")
      p += len
    }
    val text = (title +: paras).mkString("\n")
    val html = HtmlExtract.render(title, paras.toSeq, id)
    Page(
      url = f"https://site${id % 1000}%03d.example/page/$id",
      warc_ts = new Timestamp(Epoch + id * 1000L),
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = text,
      lang = "en"
    )
  }

  /** Distributed generation: narrow map over `spark.range` — no shuffle.
    * `start` offsets the id range so incremental batches generate disjoint
    * urls (append-only ingest).
    */
  def pages(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
            start: Long = 0L): Dataset[Page] = {
    import spark.implicits._
    spark.range(start, start + n).mapPartitions(_.map(id => page(id, seed)))
  }
}
