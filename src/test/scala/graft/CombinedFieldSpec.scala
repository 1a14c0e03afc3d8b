package graft

import graft.analysis.StandardAnalyzer
import graft.codec.SmallFloat
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.search._

/** BM25F combined-field scoring duels (ref
  * `/root/reference/lucene/core/src/java/org/apache/lucene/search/CombinedFieldQuery.java`
  * + `MultiNormsLeafSimScorer.java`): the engine's CombinedFieldScorer
  * against a local brute force that replicates the reference's exact
  * semantics — pseudo docFreq = max over fields, weighted sumTotalTermFreq,
  * per-doc freq = Σ weight·tf, norm = re-encoded weighted sum of decoded
  * per-field quantized lengths.
  */
class CombinedFieldSpec extends SparkTestBase {

  private val NDocs = 700
  private val an = StandardAnalyzer.Default

  private lazy val pagesLocal = (0L until NDocs.toLong).map(Corpus.page(_))
  private def fieldsOf(text: String): Seq[(String, String)] = {
    val toks = text.split(" ")
    Seq("title" -> toks.take(5).mkString(" "), "body" -> toks.drop(5).mkString(" "))
  }

  private lazy val segDir: String = {
    import spark.implicits._
    val dir = tmpDir("cfseg")
    val ds = spark.createDataset(pagesLocal.map(p => (p.url, fieldsOf(p.text))))
    IndexBuilder.buildSegmentFields(ds, dir,
      IndexConfig(bucketShift = 9, numPostingPartitions = 8, numDocPartitions = 4))
    dir
  }

  private lazy val searcher: IndexSearcher =
    new IndexSearcher(spark, Seq(Manifest.read(segDir).get))

  // ---- local BM25F brute force (float-exact, the reference's formula chain)

  private lazy val sorted = pagesLocal.sortBy(_.url).toVector
  private lazy val fieldTf: Map[String, Vector[(java.util.HashMap[String, Int], Int)]] =
    Seq("title", "body").map { f =>
      f -> sorted.map(p => an.termFreqs(fieldsOf(p.text).toMap.apply(f)))
    }.toMap

  private def fDocCount(f: String): Long = fieldTf(f).count(_._2 > 0).toLong
  private def fSttf(f: String): Long = fieldTf(f).map(_._2.toLong).sum
  private def fDocFreq(f: String, t: String): Long =
    fieldTf(f).count(_._1.containsKey(t)).toLong

  private def bruteSim(term: String, fields: Seq[(String, Double)]): Bm25FloatScorer = {
    val df = fields.map { case (f, _) => fDocFreq(f, term) }.max
    var docCount = 0L
    var sttf = 0L
    fields.foreach { case (f, w) =>
      docCount = math.max(docCount, fDocCount(f))
      sttf = (sttf + w * fSttf(f)).toLong // the reference's long += double
    }
    val avgdl = (sttf / docCount.toDouble).toFloat
    new Bm25FloatScorer(1.2f, 0.75f, Bm25.idf(df, docCount), avgdl)
  }

  private def bruteTopK(term: String, fields: Seq[(String, Double)], k: Int): Seq[(Long, Double)] = {
    val sim = bruteSim(term, fields)
    sorted.indices.flatMap { d =>
      val present = fields.flatMap { case (f, w) =>
        val (tf, len) = fieldTf(f)(d)
        if (tf.containsKey(term)) Some((w, tf.get(term), len)) else None
      }
      if (present.isEmpty) None
      else {
        val freq = present.map { case (w, tf, _) => w * tf }.sum
        val lenSum = present.map { case (w, _, len) =>
          w * SmallFloat.lengthTable(
            java.lang.Byte.toUnsignedInt(SmallFloat.intToByte4(len)))
        }.sum
        val norm = java.lang.Byte.toUnsignedInt(
          SmallFloat.intToByte4(math.round(lenSum).toInt))
        Some((d.toLong, sim.scoreF(freq, norm)))
      }
    }.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("combined-field top-k == BM25F brute force, several weightings") {
    val cases = Seq(
      "court" -> Seq("title" -> 1.0, "body" -> 1.0),
      "court" -> Seq("title" -> 2.0, "body" -> 1.0),
      "law"   -> Seq("title" -> 3.5, "body" -> 1.0),
      "the"   -> Seq("title" -> 1.0, "body" -> 2.0))
    for ((t, fws) <- cases) {
      val q = CombinedFieldQuery(t, fws)
      val got = searcher.topK(q, 10).collect().map(s => (s.docId, s.score)).toSeq
      val expected = bruteTopK(t, fws, 10)
      assert(got == expected, s"BM25F engine != brute force for $t over $fws")
      assert(expected.nonEmpty, "fixture should match")
    }
  }

  test("pruned == exhaustive (WAND bounds are sound for combined fields)") {
    val q = CombinedFieldQuery("court", Seq("title" -> 2.0, "body" -> 1.0))
    val pruned = searcher.topK(q, 10, pruning = true).collect().toSeq
    val full = searcher.topK(q, 10, pruning = false).collect().toSeq
    assert(pruned == full)
  }

  test("single field at weight 1 degenerates to the plain field term query") {
    val cf = CombinedFieldQuery("court", Seq("title" -> 1.0))
    val got = searcher.topK(cf, 10).collect().map(s => (s.docId, s.score)).toSeq
    val plain = searcher.topK(searcher.parse("title:court"), 10).collect()
      .map(s => (s.docId, s.score)).toSeq
    assert(got == plain)
  }

  test("composes in a boolean tree") {
    val cf = CombinedFieldQuery("court", Seq("title" -> 2.0, "body" -> 1.0))
    val q = BoolQuery(Seq(cf -> (Occur.Must: Occur),
      TermQuery(graft.index.FieldKey.encode("body", "law")) -> (Occur.Must: Occur)))
    val got = searcher.matching(q).collect().toSet
    val expected = sorted.indices.filter { d =>
      (fieldTf("title")(d)._1.containsKey("court") ||
        fieldTf("body")(d)._1.containsKey("court")) &&
        fieldTf("body")(d)._1.containsKey("law")
    }.map(_.toLong).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture should have conjunctive matches")
  }

  test("explain root equals the search score") {
    val q = CombinedFieldQuery("court", Seq("title" -> 2.0, "body" -> 1.0))
    for (hit <- searcher.topK(q, 5).collect()) {
      val e = searcher.explain(q, hit.docId)
      assert(e.matched && e.value == hit.score,
        s"combined explain ${e.value} != ${hit.score} for doc ${hit.docId}")
    }
  }
}
