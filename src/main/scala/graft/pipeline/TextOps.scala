package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.StandardAnalyzer

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, fingerprinting. All are
  * narrow, codegen'd column expressions (`functions._`, no UDFs) so they scan
  * at full Parquet speed and scale linearly — no shuffles except where an
  * aggregation is the point.
  */
object TextOps {

  /** Whitespace tokenization as a codegen'd column op. For corpora that are
    * already normalized (single-space-separated lowercase words) this is
    * exactly the StandardAnalyzer's output; the full analyzer path
    * ([[graft.analysis.StandardAnalyzer]]) is used by the index build.
    */
  def tokensCol(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization count: letter runs, digit runs, and single
    * non-alphanumeric marks — the pre-tokenizer split shape of byte-pair
    * encoders (RE2/Java-compatible pattern so the SQL oracle replicates it).
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Per-doc token counts: whitespace total + distinct + BPE-ish. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokensCol(col(textCol))).as("n_tokens"),
      size(array_distinct(tokensCol(col(textCol)))).as("n_unique"),
      bpeishCount(col(textCol)).as("n_bpe_tokens")
    )

  /** Corpus term statistics (docFreq, totalTermFreq) — the term-dictionary
    * view over raw text; partial aggregation keeps head terms skew-safe.
    */
  def termStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokensCol(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(
        countDistinct(col(idCol)).as("doc_freq"),
        count(lit(1)).as("total_term_freq")
      )

  private val enStop = StandardAnalyzer.EnglishStopwords.toSeq.sorted

  /** Quality signals: mean token length, stopword ratio, type-token ratio.
    * Doubles are computed with the same expression shape as the SQL oracle.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokensCol(col(textCol))
    val n = size(toks).cast("double")
    val stopArr = array(enStop.map(lit): _*)
    df.select(
      col(idCol),
      round(length(col(textCol)).cast("double") / n, 4).as("chars_per_token"),
      round(size(filter(toks, t => array_contains(stopArr, t))).cast("double") / n, 4)
        .as("stop_ratio"),
      round(size(array_distinct(toks)).cast("double") / n, 4).as("type_token_ratio")
    )
  }

  /** N-gram-free language-ID heuristic: share of tokens that are English
    * stopwords (deterministic + SQL-expressible so the oracle can replicate;
    * a real n-gram profile model plugs into the same column slot).
    */
  def langId(df: DataFrame, idCol: String, textCol: String, threshold: Double = 0.02): DataFrame = {
    val toks = tokensCol(col(textCol))
    val stopArr = array(enStop.map(lit): _*)
    val ratio = size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
      size(toks).cast("double")
    df.select(
      col(idCol),
      when(ratio >= threshold, lit("en")).otherwise(lit("und")).as("lang_pred"),
      round(ratio, 4).as("stop_ratio")
    )
  }

  /** PII patterns for training-data scrubbing — emails, North-American
    * phone shapes, IPv4 addresses. RE2-compatible (no backrefs / lookarounds)
    * so a SQL oracle replicates the scrub with the same patterns, and simple
    * enough to stay inside whole-stage codegen as `regexp_replace` chains.
    * Scrub order is fixed (email → ip → phone): the email pattern consumes
    * its whole local@domain span first so the ip/phone patterns can never
    * fire inside an address.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Redact PII in place: `<EMAIL>` / `<IP>` / `<PHONE>` placeholders. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-doc PII audit: match counts per category + the scrubbed text's
    * fingerprint (the pipeline's before/after evidence row). One codegen'd
    * projection — no shuffle, no UDF; linear at any corpus size.
    */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(
        regexp_replace(t, EmailRe, "<EMAIL>"), lit(Ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
        lit(PhoneRe), lit(0))).as("n_phones"),
      md5(piiScrub(t).cast("binary")).as("scrubbed_md5"))
  }

  /** Free-text next-word suggestion — the reference's
    * `suggest/analyzing/FreeTextSuggester.java` core: an n-gram language
    * model over the corpus ranks continuations of a context word by bigram
    * frequency (term tiebreak). The bigram extraction is one codegen'd
    * zip_with expansion; the context filter lands BEFORE the aggregation
    * shuffle, so only the context word's bigrams move. The index-side
    * variant persists the (w, next, freq) table once — the same shape as
    * the infix gram table — turning each query into a pushed point lookup.
    */
  def nextWordSuggest(df: DataFrame, textCol: String, context: String,
                      k: Int = 10): DataFrame = {
    val toks = tokensCol(col(textCol))
    df.select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w"), b.as("nw")))).as("p"))
      .select(col("p.w").as("w"), col("p.nw").as("suggestion"))
      .where(col("w") === context)
      .groupBy(col("suggestion"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("suggestion").asc)
      .limit(k)
  }

  /** Unigram cross-entropy quality score — the CCNet-style LM filter with a
    * unigram model fit on the corpus itself: p(t) = ttf(t) / N, per-doc
    * score = avg over tokens of -ln p(t) = ln N - ln ttf(t). High scores
    * flag rare-token noise; low scores flag boilerplate. Two shuffles
    * (model fit, per-doc agg); the token→ttf join broadcasts when the
    * vocabulary is bounded and falls back to a hash join (AQE decides)
    * when it isn't — the per-doc side never collects anywhere.
    */
  def unigramCrossEntropy(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokensCol(col(textCol))).as("tok"))
    val model = toks.groupBy(col("tok")).agg(count(lit(1)).as("ttf"))
    // N is one metadata-sized scalar (the only driver-side value)
    val n = model.agg(sum(col("ttf"))).first().getLong(0).toDouble
    toks.join(model.hint("broadcast"), "tok")
      .groupBy(col(idCol))
      .agg(
        round(avg(log(lit(n)) - log(col("ttf"))), 4).as("xent"),
        count(lit(1)).as("n_toks"))
  }

  /** Offset-based snippet: the ±`ctx`-word window around the hit span
    * `[start, end)` taken directly from the stored text — the consumer of
    * index-time offset postings (ref `uhighlight/UnifiedHighlighter.java`
    * OffsetSource.POSTINGS). Touches O(snippet) chars around the offset;
    * never re-tokenizes the document. Word boundaries = single spaces
    * (this corpus's stored-text invariant; general texts would expand to
    * the next whitespace run the same way).
    */
  def snippetByOffset(text: String, start: Int, end: Int, ctx: Int = 2): String = {
    // left: up to `ctx` words back; at the text edge the window SHIFTS
    // right instead of shrinking (token-window semantics: the slice starts
    // at max(1, p - ctx) and keeps its 2*ctx+1 length)
    var spacesBack = 0
    var left = 0
    var i = start - 1
    var stop = false
    while (i >= 0 && !stop) {
      if (text.charAt(i) == ' ') {
        spacesBack += 1
        // the (ctx+1)-th space delimits the ctx-th word before the hit
        if (spacesBack == ctx + 1) { left = i + 1; stop = true }
      }
      i -= 1
    }
    val wordsBefore = if (stop) ctx else spacesBack
    val wordsAfter = 2 * ctx - wordsBefore
    var right = text.length
    var j = end
    var spaces = 0
    while (j < text.length && right == text.length) {
      if (text.charAt(j) == ' ') {
        spaces += 1
        if (spaces == wordsAfter + 1) right = j
      }
      j += 1
    }
    text.substring(left, right)
  }

  /** Highlight snippet: the ±`ctx`-token window around the first occurrence
    * of `term` (the highlighter module's unified-snippet shape, re-expressed
    * as codegen'd array ops over stored text — no re-analysis pass).
    */
  def snippet(text: Column, term: String, ctx: Int = 2): Column = {
    val toks = tokensCol(text)
    val p = array_position(toks, term) // 1-based; 0 when absent
    when(p > 0,
      concat_ws(" ", slice(toks, greatest(lit(1), (p - ctx).cast("int")), lit(2 * ctx + 1))))
      .otherwise(lit(null))
  }

  /** Best-passage snippet (the `UnifiedHighlighter` passage-selection
    * shape): among all `window`-token windows, pick the one containing the
    * MOST query-term occurrences (earliest start on ties) — not merely the
    * first hit. Pure array column ops: a prefix-sum of per-token match
    * flags turns every window count into two array reads, then
    * `array_position(counts, max)` is the earliest argmax. Null when no
    * query term occurs.
    */
  def bestSnippet(text: Column, terms: Seq[String], window: Int = 7): Column = {
    val toks = tokensCol(text)
    val qArr = array(terms.map(lit): _*)
    val flags = transform(toks, t => when(array_contains(qArr, t), 1).otherwise(0))
    // ps(i+1) = matches in toks[1..i]; ps(1) = 0
    val ps = aggregate(flags, array(lit(0)),
      (acc, x) => concat(acc, array(element_at(acc, size(acc)) + x)))
    val nStarts = greatest(lit(1), size(toks) - lit(window - 1))
    val counts = transform(sequence(lit(1), nStarts), i =>
      element_at(ps, least(i + lit(window - 1), size(toks)) + 1) - element_at(ps, i))
    val best = array_position(counts, array_max(counts))
    when(array_max(counts) > 0,
      concat_ws(" ", slice(toks, best.cast("int"), lit(window))))
      .otherwise(lit(null))
  }

  /** Content fingerprint (md5) — exact-dup key; codegen'd. */
  def fingerprintMd5(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("fingerprint"))

  /** 61-bit polynomial rolling hash over codepoints (deterministic,
    * engine-native; used where a cheap orderable fingerprint is wanted
    * without md5's cost). Column expression, no UDF: fold over the
    * codepoint array.
    */
  def rollingHash(text: Column): Column = {
    val p = lit(1125899906842597L) // 2^50-ish prime
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(7L),
      (acc, c) => pmod(acc * lit(31L) + c, p)
    )
  }

  def fingerprintRolling(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), rollingHash(col(textCol)).as("rhash"))

  /** Word n-gram shingles as a codegen'd column op — the stream-transform
    * re-expression of the reference's shingle filter
    * (`/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/shingle/ShingleFilter.java`):
    * each output row is `n` consecutive tokens joined by `sep`. At 100 TB
    * this is a narrow per-row expansion (no shuffle) feeding whatever
    * aggregation wants shingles (dedup signatures, phrase stats).
    */
  def shinglesCol(text: Column, n: Int, sep: String = "_"): Column = {
    require(n >= 2, s"shingle size must be >= 2, got $n")
    val toks = tokensCol(text)
    // window starts 1..size-n+1 (1-based); explicit guard because
    // sequence(1, stop) DESCENDS when stop < 1 rather than being empty
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(sep, slice(toks, i, lit(n)))
      )).otherwise(array().cast("array<string>"))
  }

  /** Repetition signal: fraction of duplicated word n-grams per doc
    * (1 − unique/total, 0 for docs shorter than n) — the boilerplate /
    * degenerate-generation detector web-scale training pipelines run
    * (e.g. the Gopher/MassiveText repetition filters). Codegen'd: one
    * shingle expansion + two array sizes, no shuffle.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val sh = shinglesCol(col(textCol), n)
    df.select(
      col(idCol),
      size(sh).cast("bigint").as("n_grams"),
      size(array_distinct(sh)).cast("bigint").as("n_unique"),
      round(
        when(size(sh) > 0,
          lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
          .otherwise(lit(0.0)), 4).as("dup_ratio"))
  }

  /** Corpus shingle statistics: (shingle, count) over every document. */
  def shingleStats(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(shinglesCol(col(textCol), n)).as("shingle"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n"))

  /** Cavnar–Trenkle n-gram language identification ("N-Gram-Based Text
    * Categorization", SDAIR 1994): per-language rank profiles of the top-K
    * character bigrams; a document classifies to the language minimizing
    * the OUT-OF-PLACE distance (sum over the doc's top-K bigrams of
    * |doc rank − language rank|, with K as the missing-bigram penalty).
    * All-integer arithmetic end-to-end, so a SQL oracle replays the exact
    * prediction (ties in counts break by bigram, ties in distance by
    * language code).
    *
    * 100 TB shape: language profiles are L×K rows (broadcast); document
    * profiles need only a window PARTITIONED BY the document over its own
    * bigram counts (bounded by doc length, never corpus-wide); the distance
    * join is doc-profile × L against the broadcast profile table.
    */
  def langIdNgram(
      train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, langCol: String, k: Int = 40
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"bad k $k")
    def bigrams(df: DataFrame, keyCols: Seq[Column]): DataFrame =
      df.select(keyCols :+ explode(charBigrams(col(textCol))).as("bg"): _*)
    val langProf = bigrams(train, Seq(col(langCol).as("lang")))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("n"))
      .withColumn("rl", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bg").asc)))
      .where(col("rl") <= k).select(col("lang"), col("bg"), col("rl"))
    val docProf = bigrams(test, Seq(col(idCol)))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("n"))
      .withColumn("rd", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("n").desc, col("bg").asc)))
      .where(col("rd") <= k).select(col(idCol), col("bg"), col("rd"))
    val langs = langProf.select(col("lang")).distinct()
    val dist = docProf.crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("lang", "bg"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(coalesce(abs(col("rd") - col("rl")), lit(k.toLong))).as("dist"))
    dist.withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("dist").asc, col("lang").asc)))
      .where(col("rn") === 1)
      .select(col(idCol), col("lang").as("pred"), col("dist"))
  }

  /** See [[langIdNgram]]: boundary-padded word character bigrams. */
  def charBigrams(text: Column): Column = {
    val padded = transform(tokensCol(text), w => concat(lit("_"), w, lit("_")))
    flatten(transform(padded, pw =>
      transform(sequence(lit(1), length(pw) - 1), i => substring_(pw, i))))
  }

  /** substring(pw, i, 2) with a Column start (the literal-start `substring`
    * function can't take one).
    */
  private def substring_(s: Column, i: Column): Column =
    s.substr(i, lit(2))

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
    * §A1.1 MassiveText filtering) — the composite document filter a
    * pretraining pipeline runs before dedup: word-count band, mean-word-
    * length band, minimum alphabetic-word fraction, and a minimum count of
    * DISTINCT required stopwords (the "stop word" rule: a real sentence
    * contains at least two of the/be/to/of/and/that/have/with). Emits every
    * rule's measured value plus its boolean and the conjunction, so
    * downstream can tighten one band without recomputing the scan. One
    * codegen'd projection — no shuffle, no UDF; the line-shape rules
    * (bullet/ellipsis ratios) need multi-line docs and live upstream in the
    * HTML extractor, not here.
    */
  def gopherRules(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Int = 2
  ): DataFrame = {
    val toks = tokensCol(col(textCol))
    val n = size(toks).cast("double")
    val meanLen = round(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n, 4)
    val alphaFrac = round(
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / n, 4)
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = size(array_intersect(toks, array(gopherStops.map(lit): _*)))
    val nWords = size(toks).cast("long")
    val wordsOk = nWords >= minWords && nWords <= maxWords
    val lenOk = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val alphaOk = alphaFrac >= minAlphaFrac
    val stopsOk = stopHits >= minStopHits
    df.select(
      col(idCol),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_frac"), stopHits.cast("long").as("stop_hits"),
      wordsOk.as("words_ok"), lenOk.as("len_ok"),
      alphaOk.as("alpha_ok"), stopsOk.as("stops_ok"),
      (wordsOk && lenOk && alphaOk && stopsOk).as("pass"))
  }

  /** Gopher repetition rules (Rae et al. 2021 §A1.1, Table A1) — the other
    * half of [[gopherRules]]: a document is dropped when too much of it is
    * the SAME text repeated. Two families, both measured in characters (the
    * sum of word lengths — whitespace never counts):
    *
    *  - top n-gram fraction (n = 2, 3, 4): characters claimed by the single
    *    most frequent n-gram = occurrences × gram word chars / doc chars;
    *    thresholds 0.20 / 0.18 / 0.16. Ties break to the lexicographically
    *    smallest gram (deterministic, rerun-stable — the paper doesn't
    *    specify; with equal counts any choice gives the same charcount for
    *    fixed n on a uniform-length vocabulary, but not in general).
    *  - duplicate n-gram fraction (n = 5..10): characters inside the UNION
    *    of word positions covered by any n-gram occurring ≥ 2 times —
    *    overlapping duplicates count once, the paper's exact semantics
    *    ("taking care not to count characters that occur in overlapping
    *    n-grams more than once"); thresholds 0.15 / 0.14 / 0.13 / 0.12 /
    *    0.11 / 0.10.
    *
    * 100 TB shape: one posexplode scan; ONE per-doc position window whose
    * lead chain materializes every n = 2..10 gram in a single pass; one
    * count window keyed (doc, n, gram); the dup family unions coverage by
    * a distinct on (doc, n, pos) and joins word lengths back on (doc, pos).
    * Every shuffle is keyed by doc-bounded groups (a window partition is one
    * document — never corpus-wide), no UDF, no driver state. Line/paragraph
    * dup rules need multi-line docs and live upstream in the HTML extractor
    * (same machinery at n = line).
    */
  def gopherRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topThr = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupThr = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

    val words = df.select(col(idCol),
      posexplode(tokensCol(col(textCol))).as(Seq("pos", "w")))
    val docChars = words.groupBy(col(idCol))
      .agg(sum(length(col("w"))).as("doc_chars"))

    val posWin = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val leadCols = (1 to 9).map(k => lead(col("w"), k).over(posWin).as(s"w$k"))
    val withLeads = words.select(
      Seq(col(idCol), col("pos"), col("w")) ++ leadCols: _*)
    // all n = 2..10 grams from one window pass: each row carries an array of
    // (n, gram, gramchars) structs; rows whose doc tail is shorter than n
    // drop at the ok filter
    val gramStructs = array((2 to 10).map { n =>
      val parts = col("w") +: (1 until n).map(k => col(s"w$k"))
      struct(
        lit(n).as("n"),
        concat_ws(" ", parts: _*).as("gram"),
        parts.map(length).reduce(_ + _).as("gchars"),
        col(s"w${n - 1}").isNotNull.as("ok"))
    }: _*)
    val grams = withLeads
      .select(col(idCol), col("pos"), explode(gramStructs).as("g"))
      .where(col("g.ok"))
      .select(col(idCol), col("pos"), col("g.n").as("n"),
        col("g.gram").as("gram"), col("g.gchars").as("gchars"))
    val occ = grams.withColumn("cnt",
      count(lit(1)).over(Window.partitionBy(col(idCol), col("n"), col("gram"))))

    // top family: max count per (doc, n), tie to the smallest gram; struct
    // min orders by gram first so it carries that gram's charcount along
    val top = occ.where(col("n") <= 4)
      .withColumn("mx", max(col("cnt")).over(
        Window.partitionBy(col(idCol), col("n"))))
      .where(col("cnt") === col("mx"))
      .groupBy(col(idCol), col("n"))
      .agg(min(struct(col("gram"), col("gchars"), col("cnt"))).as("t"))
      .select(col(idCol), col("n"),
        (col("t.cnt") * col("t.gchars")).as("topchars"))
    val topAggs = topThr.map { case (n, _) =>
      max(when(col("n") === n, col("topchars"))).as(s"t$n")
    }
    val tops = top.groupBy(col(idCol)).agg(topAggs.head, topAggs.tail: _*)

    // dup family: union of covered positions (overlap counted once), then
    // word lengths joined back by position
    val dup = occ.where(col("n") >= 5 && col("cnt") >= 2)
      .select(col(idCol), col("n"),
        explode(sequence(col("pos"), col("pos") + col("n") - 1)).as("cpos"))
      .distinct()
      .join(words.withColumnRenamed("pos", "cpos"), Seq(idCol, "cpos"))
      .groupBy(col(idCol), col("n"))
      .agg(sum(length(col("w"))).as("dupchars"))
    val dupAggs = dupThr.map { case (n, _) =>
      max(when(col("n") === n, col("dupchars"))).as(s"d$n")
    }
    val dups = dup.groupBy(col(idCol)).agg(dupAggs.head, dupAggs.tail: _*)

    def frac(c: Column): Column =
      round(coalesce(c, lit(0L)).cast("double") / col("doc_chars"), 4)
    val fracCols =
      topThr.map { case (n, _) => frac(col(s"t$n")).as(s"top${n}_frac") } ++
      dupThr.map { case (n, _) => frac(col(s"d$n")).as(s"dup${n}_frac") }
    val passCol = (
      topThr.map { case (n, thr) => frac(col(s"t$n")) <= thr } ++
      dupThr.map { case (n, thr) => frac(col(s"d$n")) <= thr }
    ).reduce(_ && _).as("pass")

    docChars
      .join(tops, Seq(idCol), "left")
      .join(dups, Seq(idCol), "left")
      .select(col(idCol) +: (fracCols :+ passCol): _*)
  }
}
