package graft

import graft.corpus.Corpus
import graft.index.{FeatureIndexer, IndexBuilder, IndexConfig, Manifest}
import graft.search._

/** Static ranking features carried in posting frequencies (ref
  * `document/FeatureField.java` + `FeatureQuery.java`): the 17-bit value
  * codec, the three score functions against a local brute force, soundness
  * of WAND pruning, boolean composition with BM25 text scoring, index
  * integrity after the append pass, and merge survival.
  */
class FeatureFieldSpec extends SparkTestBase {

  private val NDocs = 500

  private lazy val pagesLocal = (0L until NDocs.toLong).map(Corpus.page(_))

  /** Deterministic per-doc feature: positive, spread over a wide range,
    * NOT exactly encodable for many docs (exercises quantization).
    */
  private def rawValue(url: String): Float =
    (math.abs(url.hashCode % 9973) + 0.5f) / 7.0f

  private lazy val segDir: String = {
    import spark.implicits._
    val dir = tmpDir("featseg")
    val ds = spark.createDataset(pagesLocal.map(p => (p.url, p.text)))
    IndexBuilder.buildSegment(ds, dir,
      IndexConfig(bucketShift = 9, numPostingPartitions = 8, numDocPartitions = 4))
    val features = spark.createDataset(
      pagesLocal.map(p => (p.url, "pagerank", rawValue(p.url))))
      .toDF("url", "feature", "value")
    FeatureIndexer.addFeatures(spark, dir, features)
    dir
  }

  private lazy val searcher: IndexSearcher =
    new IndexSearcher(spark, Seq(Manifest.read(segDir).get))

  // quantized value exactly as the index stores it
  private def qValue(url: String): Float =
    FeatureIndexer.decodeValue(FeatureIndexer.encodeValue(rawValue(url)))

  private lazy val sorted = pagesLocal.sortBy(_.url).toVector

  test("value codec: integers <= 512 round-trip exactly; monotone; bounded error") {
    for (i <- 1 to 512)
      assert(FeatureIndexer.decodeValue(FeatureIndexer.encodeValue(i.toFloat)) == i.toFloat)
    // monotone: encode preserves order on positive normals
    val vs = Seq(0.001f, 0.5f, 1f, 1.5f, 2f, 100f, 1e6f, 1e30f)
    val es = vs.map(FeatureIndexer.encodeValue)
    assert(es == es.sorted)
    // decoded value never exceeds the original and is within 2^-9 relative
    for (v <- Seq(3.7f, 1234.567f, 0.0123f, 9.999e8f)) {
      val d = FeatureIndexer.decodeValue(FeatureIndexer.encodeValue(v))
      assert(d <= v && d >= v * (1 - 1.0f / 256), s"quantization of $v -> $d")
    }
  }

  test("all three functions == brute force (rank identity, float-exact)") {
    val fns: Seq[(FeatureFunction, Float => Float)] = Seq(
      (FeatureFunction.Linear, v => 2.0f * v),
      (FeatureFunction.Log(1.0), v => (2.0 * math.log(1.0 + v)).toFloat),
      (FeatureFunction.Saturation(700.0), v => 2.0f * (1f - 700f / (v + 700f))))
    for ((fn, brute) <- fns) {
      val q = FeatureQuery("pagerank", fn, weight = 2.0)
      val got = searcher.topK(q, 15).collect().map(s => (s.docId, s.score)).toSeq
      val expected = sorted.zipWithIndex
        .map { case (p, d) => (d.toLong, brute(qValue(p.url)).toDouble) }
        .sortBy { case (d, s) => (-s, d) }.take(15)
      assert(got == expected, s"feature ranking mismatch for $fn")
    }
  }

  test("pruned == exhaustive (impact bounds sound for monotone transforms)") {
    val q = FeatureQuery("pagerank", FeatureFunction.Saturation(700.0), 2.0)
    assert(searcher.topK(q, 10, pruning = true).collect().toSeq ==
      searcher.topK(q, 10, pruning = false).collect().toSeq)
  }

  test("composes with BM25 text scoring as a SHOULD clause") {
    val an = graft.analysis.StandardAnalyzer.Default
    val q = BoolQuery(Seq(
      TermQuery("court") -> (Occur.Should: Occur),
      FeatureQuery("pagerank", FeatureFunction.Saturation(700.0), 0.8) -> (Occur.Should: Occur)))
    val got = searcher.topK(q, 10).collect().map(s => (s.docId, s.score)).toSeq

    // brute: BM25 for 'court' + saturation, both float-exact
    val tf = sorted.map(p => an.termFreqs(p.text))
    val docCount = tf.count(_._2 > 0).toLong
    val avgdl = (tf.map(_._2.toLong).sum / docCount.toDouble).toFloat
    val df = tf.count(_._1.containsKey("court")).toLong
    val bm = new Bm25FloatScorer(1.2f, 0.75f, Bm25.idf(df, docCount), avgdl)
    val expected = sorted.indices.map { d =>
      val (m, len) = tf(d)
      val text =
        if (m.containsKey("court"))
          bm.score(m.get("court"), java.lang.Byte.toUnsignedInt(
            graft.codec.SmallFloat.intToByte4(len)))
        else 0.0
      val feat = (0.8f * (1f - 700f / (qValue(sorted(d).url) + 700f))).toDouble
      (d.toLong, text + feat)
    }.sortBy { case (d, s) => (-s, d) }.take(10)
    assert(got == expected)
  }

  test("explain root equals the search score") {
    val q = FeatureQuery("pagerank", FeatureFunction.Log(2.0), 1.5)
    for (hit <- searcher.topK(q, 5).collect()) {
      val e = searcher.explain(q, hit.docId)
      assert(e.matched && e.value == hit.score)
    }
  }

  test("default saturation pivot = decoded average posting freq") {
    val avgFreq = (sorted.map(p =>
      FeatureIndexer.encodeValue(rawValue(p.url)).toLong).sum.toDouble / NDocs).toFloat
    val expected = FeatureIndexer.decodeValue(avgFreq.toInt)
    assert(searcher.defaultFeaturePivot("pagerank") == expected)
    assert(searcher.defaultFeaturePivot("nosuch") == 1f)
  }

  test("CheckIndex passes after the feature append (manifest stays consistent)") {
    val report = graft.index.CheckIndex.check(spark, segDir)
    assert(report.violations.isEmpty, report.violations.mkString("; "))
  }

  test("batchId makes the append replay-idempotent") {
    import spark.implicits._
    val dir = tmpDir("featreplay")
    val ds = spark.createDataset(pagesLocal.take(50).map(p => (p.url, p.text)))
    IndexBuilder.buildSegment(ds, dir,
      IndexConfig(bucketShift = 9, numPostingPartitions = 2, numDocPartitions = 1))
    val features = spark.createDataset(pagesLocal.take(50).map(p =>
      (p.url, "pagerank", 10.0f))).toDF("url", "feature", "value")
    val m1 = FeatureIndexer.addFeatures(spark, dir, features, batchId = Some("b1"))
    val m2 = FeatureIndexer.addFeatures(spark, dir, features, batchId = Some("b1"))
    assert(m1.termCount == m2.termCount && m1.blockCount == m2.blockCount)
    val se = new IndexSearcher(spark, Seq(Manifest.read(dir).get))
    // postings were not doubled: every doc matches exactly once with w*v
    val hits = se.topK(FeatureQuery("pagerank", FeatureFunction.Linear), 60).collect()
    assert(hits.length == 50 && hits.forall(_.score == 10.0))
    assert(graft.index.CheckIndex.check(spark, dir).ok)
  }

  test("absent feature -> no match; unknown feature -> empty") {
    import spark.implicits._
    val dir = tmpDir("featpart")
    val ds = spark.createDataset(pagesLocal.take(100).map(p => (p.url, p.text)))
    IndexBuilder.buildSegment(ds, dir,
      IndexConfig(bucketShift = 9, numPostingPartitions = 4, numDocPartitions = 2))
    // only even-ranked urls carry the feature
    val sortedUrls = pagesLocal.take(100).map(_.url).sorted
    val features = spark.createDataset(
      sortedUrls.zipWithIndex.collect { case (u, i) if i % 2 == 0 =>
        (u, "pagerank", 10.0f) })
      .toDF("url", "feature", "value")
    FeatureIndexer.addFeatures(spark, dir, features)
    val se = new IndexSearcher(spark, Seq(Manifest.read(dir).get))
    val ids = se.matching(FeatureQuery("pagerank", FeatureFunction.Linear)).collect().toSet
    assert(ids == (0 until 100 by 2).map(_.toLong).toSet)
    assert(se.topK(FeatureQuery("nosuch", FeatureFunction.Linear), 5).collect().isEmpty)
  }

  test("feature postings survive a segment merge") {
    import spark.implicits._
    val cfg = IndexConfig(bucketShift = 9, numPostingPartitions = 4, numDocPartitions = 2)
    val root = tmpDir("featmerge")
    val (h1, h2) = pagesLocal.splitAt(NDocs / 2)
    for ((h, name) <- Seq((h1, "a"), (h2, "b"))) {
      IndexBuilder.buildSegment(
        spark.createDataset(h.map(p => (p.url, p.text))), s"$root/$name", cfg)
      FeatureIndexer.addFeatures(spark, s"$root/$name",
        spark.createDataset(h.map(p => (p.url, "pagerank", rawValue(p.url))))
          .toDF("url", "feature", "value"))
    }
    graft.index.SegmentMerger.merge(spark, Seq(s"$root/a", s"$root/b"), s"$root/m", cfg)
    val seM = new IndexSearcher(spark, Seq(Manifest.read(s"$root/m").get))
    val q = FeatureQuery("pagerank", FeatureFunction.Saturation(700.0), 2.0)
    def byUrl(se: IndexSearcher): Seq[(String, Double)] = {
      val hits = se.topK(q, 10).collect()
      val urls = se.docsForIds(hits.map(_.docId).toSeq)
        .select("docId", "url").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      hits.map(h => urls(h.docId) -> h.score).toSeq
    }
    assert(byUrl(seM) == byUrl(searcher).take(10).map(identity),
      "merged feature ranking != single-segment ranking")
  }
}
