package graft

import graft.codec.SmallFloat

/** DuckDB oracle-SQL builders for the fulltext query entries. The SQL
  * replicates the engine's double-precision BM25 semantics exactly:
  *
  *  - tokenization: the `documents` corpus is single-space-separated
  *    lowercase `[a-z]+` words, on which `string_split(text, ' ')` is
  *    byte-identical to the StandardAnalyzer token stream (asserted in
  *    `PipelineSpec`)
  *  - norm quantization: the SmallFloat byte4 length table is inlined as a
  *    VALUES list and applied with `max(v) WHERE v <= dl` (= intToByte4
  *    rounding-down), matching `graft.codec.SmallFloat`
  *  - scoring: idf = ln(1 + (N - n + 0.5)/(n + 0.5)); norminv =
  *    1/(1.2*(0.25 + 0.75*qdl/avgdl)); score = idf - idf/(1 + freq*norminv)
  *    — the same expression shape as [[graft.search.Bm25DoubleScorer]];
  *    6-dp rounding absorbs last-ulp libm differences
  */
object OracleSql {

  /** Distinct decoded byte4 lengths (ascending) — the quantization lattice. */
  lazy val byte4Values: Seq[Long] = SmallFloat.lengthTable.map(_.toLong).distinct.sorted.toSeq

  private def byte4ValuesList: String = byte4Values.map(v => s"($v)").mkString(",")

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  /** Default token source: the corpus itself (space-split == analyzer). */
  val defaultTok: String =
    "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents"

  /** Shared CTE prefix: tokens, per-doc (raw, quantized) lengths, collection
    * stats, per-(doc, term) freqs and BM25 scores for `terms`. `tokSql`
    * overrides the token source (e.g. a stemmed or derived token stream) —
    * it must yield (doc_id, term) rows.
    */
  def bm25Ctes(terms: Seq[String], tokSql: String = defaultTok): String = {
    val termList = terms.map(sqlStr).mkString(", ")
    s"""WITH tok AS (
       |  $tokSql
       |), dlen AS (
       |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
       |), qlen AS (
       |  SELECT doc_id, dl,
       |    (SELECT max(v) FROM (VALUES $byte4ValuesList) b4(v) WHERE v <= dl) AS qdl
       |  FROM dlen
       |), stats AS (
       |  SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sttf,
       |         sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
       |  FROM dlen
       |), tf AS (
       |  SELECT doc_id, term, count(*)::DOUBLE AS freq FROM tok
       |  WHERE term IN ($termList) GROUP BY doc_id, term
       |), idf AS (
       |  SELECT term, ln(1 + ((SELECT n FROM stats) - count(*) + 0.5) / (count(*) + 0.5)) AS idf
       |  FROM tf GROUP BY term
       |), sc AS (
       |  SELECT tf.doc_id, tf.term,
       |    idf.idf - idf.idf / (1 + tf.freq *
       |      (1.0 / (1.2 * (0.25 + 0.75 * qlen.qdl / (SELECT avgdl FROM stats))))) AS s
       |  FROM tf JOIN idf USING (term) JOIN qlen ON qlen.doc_id = tf.doc_id
       |)""".stripMargin
  }

  def hasTerm(t: String): String =
    s"doc_id IN (SELECT doc_id FROM tok WHERE term = ${sqlStr(t)})"

  /** Top-k BM25: score = sum over matched `scoreTerms`; `pred` restricts the
    * matching docs (SQL over `scored`, may reference `tok`).
    */
  def bm25TopK(scoreTerms: Seq[String], pred: String, k: Int,
      tokSql: String = defaultTok): String =
    s"""${bm25Ctes(scoreTerms, tokSql)}, scored AS (
       |  SELECT doc_id, sum(s) AS score, count(*) AS nmatch FROM sc GROUP BY doc_id
       |)
       |SELECT doc_id, round(score, 6) AS score FROM scored
       |WHERE $pred
       |ORDER BY round(score, 6) DESC, doc_id ASC LIMIT $k""".stripMargin

  /** Top-k ClassicSimilarity (TF-IDF): idf = ln((N+1)/(df+1)) + 1,
    * tf = sqrt(freq), lengthNorm = 1/sqrt(quantized length) — the same
    * expression shape as [[graft.search.TfIdfDoubleScorer]].
    */
  def tfidfTopK(scoreTerms: Seq[String], k: Int): String = {
    val termList = scoreTerms.map(sqlStr).mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), dlen AS (
       |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
       |), qlen AS (
       |  SELECT doc_id, dl,
       |    (SELECT max(v) FROM (VALUES $byte4ValuesList) b4(v) WHERE v <= dl) AS qdl
       |  FROM dlen
       |), stats AS (
       |  SELECT count(*)::DOUBLE AS n FROM dlen
       |), tf AS (
       |  SELECT doc_id, term, count(*)::DOUBLE AS freq FROM tok
       |  WHERE term IN ($termList) GROUP BY doc_id, term
       |), idf AS (
       |  SELECT term, ln(((SELECT n FROM stats) + 1) / (count(*) + 1)) + 1 AS idf
       |  FROM tf GROUP BY term
       |), sc AS (
       |  SELECT tf.doc_id, sqrt(tf.freq) * idf.idf * (1.0 / sqrt(qlen.qdl)) AS s
       |  FROM tf JOIN idf USING (term) JOIN qlen ON qlen.doc_id = tf.doc_id
       |), scored AS (
       |  SELECT doc_id, sum(s) AS score FROM sc GROUP BY doc_id
       |)
       |SELECT doc_id, round(score, 6) AS score FROM scored
       |ORDER BY round(score, 6) DESC, doc_id ASC LIMIT $k""".stripMargin
  }

  /** Full scored ranking (no limit) used by grouping/pagination oracles. */
  def bm25Scored(scoreTerms: Seq[String], pred: String): String =
    s"""${bm25Ctes(scoreTerms)}, scored AS (
       |  SELECT doc_id, sum(s) AS score, count(*) AS nmatch FROM sc GROUP BY doc_id
       |), ranked AS (
       |  SELECT doc_id, round(score, 6) AS score FROM scored WHERE $pred
       |)""".stripMargin

  /** The Harman S-stemmer as a SQL CASE over expression `v` — an
    * independent DuckDB replica of the rule table in
    * [[graft.analysis.EnglishMinimalStemmer]] (the differential oracle for
    * the stemming analysis chain).
    */
  def minimalStemCase(v: String): String =
    s"""CASE WHEN len($v) < 3 OR substr($v, len($v), 1) <> 's' THEN $v
       |  WHEN substr($v, len($v)-1, 1) IN ('u','s') THEN $v
       |  WHEN substr($v, len($v)-1, 1) = 'e' THEN
       |    CASE WHEN len($v) > 3 AND substr($v, len($v)-2, 1) = 'i'
       |              AND substr($v, len($v)-3, 1) NOT IN ('a','e')
       |           THEN substr($v, 1, len($v)-3) || 'y'
       |         WHEN substr($v, len($v)-2, 1) IN ('i','a','o','u') THEN $v
       |         ELSE substr($v, 1, len($v)-1) END
       |  ELSE substr($v, 1, len($v)-1) END""".stripMargin

  /** American Soundex of expression `v` as DuckDB SQL — the independent
    * replica of [[graft.analysis.Phonetic.soundex]]'s column chain (same
    * algorithm, RE2-safe: run collapse is one replace per digit, no
    * backreferences — DuckDB's RE2 engine rejects `\1` in patterns).
    */
  def soundexSql(v: String): String = {
    val digits =
      s"translate(substr(upper($v),1,1) || translate(substr(upper($v),2), 'HW', '')," +
        s" 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '${graft.analysis.Phonetic.CodeTable}')"
    val collapsed = (1 to 6).foldLeft(digits) { (d, k) =>
      s"regexp_replace($d, '$k{2,}', '$k', 'g')"
    }
    s"substr(upper($v),1,1) || substr(translate(substr($collapsed,2),'0','') || '000', 1, 3)"
  }

  /** Deterministic morphological variant of token `w` at 1-based position
    * `i`: 'query' always becomes 'queries'; every 3rd token gets '-s', every
    * 3rd+1 '-es'. Mirrors the Spark-side derivation in the `ft_stem_topk`
    * entry exactly (0-based transform index k = i - 1).
    */
  def pluralizeCase(w: String, i: String): String =
    s"""CASE WHEN $w = 'query' THEN 'queries'
       |  WHEN ($i - 1) % 3 = 1 THEN $w || 's'
       |  WHEN ($i - 1) % 3 = 2 THEN $w || 'es'
       |  ELSE $w END""".stripMargin

  /** Token source for the stemmed-index oracle: pluralize the corpus
    * deterministically, then stem every token with the S-stemmer CASE.
    */
  val stemTok: String =
    s"""SELECT doc_id, ${minimalStemCase("v")} AS term FROM (
       |    SELECT doc_id, ${pluralizeCase("w", "i")} AS v FROM (
       |      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |             generate_subscripts(string_split(text, ' '), 1) AS i
       |      FROM documents))""".stripMargin

  /** Token source for the CJK-bigram oracle: rebuild the deterministic
    * mixed-script corpus from doc_id, split on spaces, then emit each
    * non-ASCII word's overlapping character bigrams (a 1-char word would
    * emit its unigram) — the independent DuckDB replica of the
    * `CJKBigramFilter` stream over [[graft.SparkEntry]]'s cjkTextOf corpus.
    * The bigram arm cross-joins a CONSTANT series (DuckDB's
    * generate_series cannot laterally reference `w`) and filters to
    * `i <= len(w) - 1`; corpus words are <= 8 chars.
    */
  val cjkTok: String =
    s"""SELECT doc_id, term FROM (
       |    SELECT doc_id, w AS term FROM (
       |      SELECT doc_id, unnest(string_split(
       |        'web ' ||
       |        CASE WHEN doc_id % 3 = 0 THEN '数据库'
       |             WHEN doc_id % 3 = 1 THEN '数据' ELSE '查询' END ||
       |        ' ' ||
       |        CASE WHEN doc_id % 4 = 0 THEN 'データ' ELSE '検索' END ||
       |        CASE WHEN doc_id % 5 = 0 THEN ' 한국어' ELSE '' END ||
       |        CASE WHEN doc_id % 7 = 0 THEN ' index' ELSE '' END, ' ')) AS w
       |      FROM documents)
       |    WHERE regexp_matches(w, '^[a-z0-9]+$$') OR len(w) = 1
       |    UNION ALL
       |    SELECT doc_id, substr(w, i, 2) AS term FROM (
       |      SELECT doc_id, unnest(string_split(
       |        'web ' ||
       |        CASE WHEN doc_id % 3 = 0 THEN '数据库'
       |             WHEN doc_id % 3 = 1 THEN '数据' ELSE '查询' END ||
       |        ' ' ||
       |        CASE WHEN doc_id % 4 = 0 THEN 'データ' ELSE '検索' END ||
       |        CASE WHEN doc_id % 5 = 0 THEN ' 한국어' ELSE '' END ||
       |        CASE WHEN doc_id % 7 = 0 THEN ' index' ELSE '' END, ' ')) AS w
       |      FROM documents)
       |    CROSS JOIN generate_series(1, 8) g(i)
       |    WHERE NOT regexp_matches(w, '^[a-z0-9]+$$') AND i <= len(w) - 1)""".stripMargin

  /** SRP bucket id of DOUBLE[] expression `vExpr` for one hash table: the
    * sign bits of `nPlanes` deterministic hyperplane dot products, packed.
    * Replicates [[graft.pipeline.Similarity.srpBucket]] with the plane
    * components inlined as literals (splitmix64 is deterministic, so the
    * oracle's arithmetic is fully independent of the engine).
    */
  def srpBucketSql(vExpr: String, dim: Int, nPlanes: Int, seed: Long): String =
    (0 until nPlanes).map { p =>
      val lits = (0 until dim)
        .map(j => graft.pipeline.Similarity.planeComponent(seed, p, j))
        .mkString(", ")
      s"(CASE WHEN list_dot_product($vExpr, [$lits]) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** One SELECT arm per hash table over CTE `v(id, v)`: (id, tbl, bucket). */
  def srpBucketArms(dim: Int, nPlanes: Int, tables: Int, seed: Long = 42L): String =
    (0 until tables).map { t =>
      s"  SELECT id, $t AS tbl, ${srpBucketSql("v", dim, nPlanes, seed + t * 7919L)} AS bucket FROM v"
    }.mkString("\n  UNION ALL\n")

  /** Shared CTE prefix for the binary-quantization oracles: per-component
    * exact midrange centers, sign bits, and each vector's Hamming distance
    * to vec 0 — all replicated from the raw floats (the oracle never packs
    * bits, so the engine's popcount(xor) path is verified independently).
    */
  val bqHamCtes: String =
    """WITH comp AS (
      |  SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |), cent AS (SELECT i, (min(x) + max(x)) / 2 AS m FROM comp GROUP BY i),
      |bits AS (SELECT vec_id, i, (x >= m) AS b FROM comp JOIN cent USING (i)),
      |q AS (SELECT i, b FROM bits WHERE vec_id = 0),
      |ham AS (
      |  SELECT bits.vec_id,
      |         sum(CASE WHEN bits.b <> q.b THEN 1 ELSE 0 END)::INT AS hamming
      |  FROM bits JOIN q USING (i) WHERE bits.vec_id <> 0 GROUP BY bits.vec_id
      |)""".stripMargin

  /** Adds the asymmetric-estimator CTEs to [[bqHamCtes]]: `qc` = the
    * centered query components, `est` = per-vector Σ qc·(2b−1), rounded to
    * 4 dp (the engine rounds the same way before the candidate cut).
    */
  val bqEstCtes: String = bqHamCtes +
    """,
      |qc AS (SELECT i, x - m AS v FROM comp JOIN cent USING (i) WHERE vec_id = 0),
      |est AS (
      |  SELECT bits.vec_id,
      |         round(sum(CASE WHEN bits.b THEN qc.v ELSE -qc.v END), 4) AS est
      |  FROM bits JOIN qc USING (i) WHERE bits.vec_id <> 0 GROUP BY bits.vec_id
      |)""".stripMargin

  /** Shared tail: (found, total, recall) from `exact` and `approx` pair CTEs. */
  val recallTail: String =
    """fnd AS (SELECT count(*) AS f FROM exact JOIN approx USING (id_a, id_b)),
      |tot AS (SELECT count(*) AS t FROM exact)
      |SELECT f::BIGINT AS found, t::BIGINT AS total,
      |       round(CASE WHEN t = 0 THEN 1.0 ELSE f::DOUBLE / t END, 4) AS recall
      |FROM fnd, tot""".stripMargin

  /** Shared CTE fragment: exact w=2 Jaccard >= `minJ` pairs over
    * `documents` (the dedup_jaccard oracle's pipeline as named CTEs
    * `sh`/`exact`).
    */
  def jaccardExactCtes(minJ: Double = 0.5): String =
    s"""t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents
      |), big AS (
      |  SELECT doc_id AS id,
      |         term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS s
      |  FROM t
      |), sh AS (SELECT DISTINCT id, s FROM big WHERE s IS NOT NULL),
      |jn AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
      |jp AS (
      |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2
      |),
      |exact AS (
      |  SELECT id_a, id_b FROM jp
      |  JOIN jn na ON na.id = id_a JOIN jn nb ON nb.id = id_b
      |  WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 4) >= $minJ
      |)""".stripMargin

  /** Matching doc_ids (no scores). */
  def matchIds(terms: Seq[String], pred: String): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), docs AS (SELECT DISTINCT doc_id FROM documents)
       |SELECT doc_id FROM docs WHERE $pred ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- spatial

  /** The deterministic synthetic point CTE — the SQL half of
    * [[graft.spatial.Geo.syntheticPoints]] (pure integer arithmetic, so the
    * two derivations are bit-identical).
    */
  val geoPts: String =
    """pts AS (
      |  SELECT doc_id, ((doc_id*37) % 1700)/10.0 - 85.0 AS lat,
      |         ((doc_id*73) % 3600)/10.0 - 180.0 AS lon FROM documents
      |)""".stripMargin

  /** Exact haversine over columns `lat`/`lon`, operation-for-operation the
    * expression tree of [[graft.spatial.Geo.haversineMeters]] (multiplication
    * instead of pow, identical association order); the remaining last-ulp
    * libm differences are absorbed by the entries' float32 output cast.
    */
  def havSql(qLat: Double, qLon: Double): String = {
    val sLat = s"sin((radians(lat)-radians($qLat))/2)"
    val sLon = s"sin((radians(lon)-radians($qLon))/2)"
    s"2*6371008.7714*asin(sqrt($sLat*$sLat + " +
      s"cos(radians($qLat))*cos(radians(lat))*$sLon*$sLon))"
  }

  /** Independent replica of [[graft.pipeline.Dedup.semanticDedup]]: unrolled
    * k-medians Lloyd iterations as chained CTEs (init = k lowest ids,
    * assignment = 9-dp-rounded left-fold squared distance with lowest-index
    * tie-break, update = 6-dp-rounded per-dimension median with empty
    * clusters holding their previous centroid), then the within-cluster
    * keep-lowest-id cosine prune. Distances fold left-to-right via
    * `list_sum(list_transform(..))` — the same sequential order the Spark
    * side's `aggregate(zip_with(..))` folds in, so the 9-dp round compares
    * the same double on both engines.
    */
  def semanticDedupSql(k: Int, iters: Int, tau: Double, dim: Int): String = {
    val d1 = dim + 1
    def dist(centL: String, out: String) =
      s"""$out AS (
         |  SELECT p.id, i.c,
         |         round(list_sum(list_transform(range(1, $d1),
         |           j -> (p.v[j] - i.cl[j]) * (p.v[j] - i.cl[j]))), 9) AS d
         |  FROM pts p CROSS JOIN $centL i)""".stripMargin
    def argmin(distT: String, out: String) =
      s"""$out AS (
         |  SELECT id, c FROM (
         |    SELECT id, c, row_number() OVER (PARTITION BY id ORDER BY d, c) AS rn
         |    FROM $distT) WHERE rn = 1)""".stripMargin
    def update(assignT: String, prevCentL: String, out: String) =
      s"""${out}_m AS (
         |  SELECT a.c, t.j, round(median(p.v[t.j]), 6) AS m
         |  FROM $assignT a JOIN pts p USING (id)
         |  CROSS JOIN range(1, $d1) t(j) GROUP BY a.c, t.j),
         |$out AS (
         |  SELECT i.c, coalesce(n.cl, i.cl) AS cl
         |  FROM $prevCentL i LEFT JOIN (
         |    SELECT c, list(m ORDER BY j) AS cl FROM ${out}_m GROUP BY c) n
         |  USING (c))""".stripMargin
    val steps = (1 to iters).map { t =>
      val prev = if (t == 1) "cent0" else s"cent${t - 1}"
      s"${dist(prev, s"d$t")},\n${argmin(s"d$t", s"a$t")},\n" +
        update(s"a$t", prev, s"cent$t")
    }.mkString(",\n")
    s"""WITH pts AS (
       |  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings),
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS c, v AS cl
       |  FROM (SELECT id, v FROM pts ORDER BY id LIMIT $k)),
       |$steps,
       |${dist(s"cent$iters", "df")},
       |${argmin("df", "af")},
       |cv AS (SELECT a.id, a.c, p.v FROM af a JOIN pts p USING (id)),
       |drops AS (
       |  SELECT DISTINCT b.id FROM cv a JOIN cv b
       |    ON a.c = b.c AND a.id < b.id
       |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $tau)
       |SELECT id AS vec_id, c AS cluster FROM cv
       |WHERE id NOT IN (SELECT id FROM drops)
       |ORDER BY vec_id""".stripMargin
  }

  /** BPE training unrolled (Sennrich ACL'16, mirrors `pipeline/Bpe.train`):
    * one CTE band per merge — adjacent pairs via lead(), 1-row argmax with
    * the (count desc, left, right) tie-break, then the left-to-right
    * non-overlapping merge via the same run arithmetic as the engine
    * (islands of consecutive occurrences merge at odd in-island positions).
    */
  private def bpeSymCtes(numMerges: Int): String = {
    // MATERIALIZED throughout: each band references its predecessors
    // several times; DuckDB CTEs inline by default, which would re-evaluate
    // the whole unrolled chain exponentially (~3^k) — materialization makes
    // the oracle linear in the merge count like the engine
    def band(i: Int): String = {
      val prev = if (i == 1) "sym0" else s"sym${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT w, cnt, pos, sym,
         |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |  FROM $prev),
         |b$i AS MATERIALIZED (
         |  SELECT sym AS a, nxt AS b2, sum(cnt) AS c FROM p$i
         |  WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY c DESC, a ASC, b2 ASC LIMIT 1),
         |m$i AS (
         |  SELECT *, coalesce(
         |    sym = (SELECT a FROM b$i) AND nxt = (SELECT b2 FROM b$i), FALSE) AS mark
         |  FROM p$i),
         |r$i AS (
         |  SELECT *, row_number() OVER (PARTITION BY w, mark ORDER BY pos) AS mrn
         |  FROM m$i),
         |o$i AS (
         |  SELECT *, CASE WHEN mark THEN
         |    row_number() OVER (PARTITION BY w, mark, pos - mrn ORDER BY pos)
         |  END AS off FROM r$i),
         |s$i AS (SELECT *, mark AND off % 2 = 1 AS mstart FROM o$i),
         |t$i AS (
         |  SELECT *, coalesce(lag(mstart) OVER (PARTITION BY w ORDER BY pos), FALSE) AS consumed
         |  FROM s$i),
         |sym$i AS MATERIALIZED (
         |  SELECT w, cnt, row_number() OVER (PARTITION BY w ORDER BY pos) AS pos,
         |    CASE WHEN mstart THEN sym || nxt ELSE sym END AS sym
         |  FROM t$i WHERE NOT consumed)""".stripMargin
    }
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
       |), words AS (
       |  SELECT w, count(*) AS cnt FROM tok WHERE w <> '' GROUP BY w
       |), sym0 AS MATERIALIZED (
       |  SELECT w, cnt, pos, substring(w, pos::INT, 1) AS sym
       |  FROM (SELECT w, cnt, unnest(range(1, length(w) + 1)) AS pos FROM words)
       |),
       |${(1 to numMerges).map(band).mkString(",\n")}""".stripMargin
  }

  /** The learned merge table: (rank, pair_left, pair_right, pair_count). */
  def bpeMerges(numMerges: Int): String =
    s"""${bpeSymCtes(numMerges)}
       |${(1 to numMerges).map(i =>
          s"SELECT $i AS merge_rank, a AS pair_left, b2 AS pair_right, c AS pair_count FROM b$i")
         .mkString("\nUNION ALL\n")}
       |ORDER BY merge_rank""".stripMargin

  /** Per-doc BPE token counts after `numMerges` merges: the final symbol
    * table's per-word segment counts joined back to the doc-word explode.
    */
  def bpeEncode(numMerges: Int): String =
    s"""${bpeSymCtes(numMerges)},
       |wlen AS (SELECT w, count(*) AS ns FROM sym$numMerges GROUP BY w),
       |docw AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |)
       |SELECT doc_id, sum(ns) AS n_bpe FROM docw JOIN wlen USING (w)
       |WHERE w <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
