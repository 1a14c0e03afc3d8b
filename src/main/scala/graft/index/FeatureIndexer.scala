package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{BlockCodec, Impacts}
import graft.index.Schema.PostingBlock

/** Static per-document ranking features carried inside the inverted index —
  * the re-expression of the reference's `FeatureField`
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/document/FeatureField.java`):
  * a feature is a term in a dedicated pseudo-field whose term FREQUENCY
  * encodes the feature value (the float's top 17 bits,
  * `FeatureField.java:184-186` `floatToIntBits(v) >>> 15` — lossless for
  * integer values up to 512, ~0.4% relative error otherwise). Norms are
  * omitted (the posting's norm byte is a constant 1 and feature scorers
  * ignore it), so features never distort BM25 length normalization, and the
  * postings ride the ordinary block/impact machinery — feature queries get
  * WAND/block-max pruning from the same freq skylines as text terms.
  */
object FeatureIndexer {

  /** Pseudo-field that namespaces feature terms in the shared dictionary. */
  val Field = "features"

  def featureTerm(feature: String): String = FieldKey.encode(Field, feature)

  /** `FeatureField.java:184-186`: freq = top 17 bits of the IEEE754 value.
    * Requires a positive, finite, normal value like the reference's ctor.
    */
  def encodeValue(v: Float): Int = {
    require(java.lang.Float.isFinite(v) && v >= java.lang.Float.MIN_NORMAL,
      s"feature value must be a positive, finite, normal float, got $v")
    java.lang.Float.floatToIntBits(v) >>> 15
  }

  /** `FeatureField.java:239-249`: lossless freq → value. */
  def decodeValue(freq: Int): Float =
    java.lang.Float.intBitsToFloat(freq << 15)

  /** Append feature postings to a committed segment. `features` columns:
    * (url, feature, value); one row per (doc, feature), values positive
    * normal floats. Docs are resolved through the segment's own row store
    * (url → docId), so the pass composes with any index sort. The appended
    * blocks/dictionary rows are ordinary postings — merges, CheckIndex and
    * dictionary pruning treat them like text terms — and the manifest's
    * termCount is bumped atomically. Global sumTotalTermFreq is left
    * untouched: feature frequencies are value encodings, not token counts,
    * and must not distort avgdl (the reference's feature fields likewise
    * live outside text collection stats).
    */
  /** @param batchId replay guard: when set, a completed append drops a
    *   marker file and an identical replay becomes a no-op (streaming-replay
    *   idempotence). A crash in the middle of an un-gated append leaves the
    *   terms table ahead of the manifest's termCount, which CheckIndex
    *   reports — rebuild or roll back the segment then.
    */
  def addFeatures(spark: SparkSession, segDir: String, features: DataFrame,
      batchId: Option[String] = None): SegmentManifest = {
    import spark.implicits._
    val markerPath = batchId.map(id =>
      java.nio.file.Paths.get(segDir, s".features_done_$id"))
    markerPath.foreach { p =>
      if (java.nio.file.Files.exists(p))
        return Manifest.read(segDir).getOrElse(
          throw new IllegalStateException(s"no committed segment at $segDir"))
    }
    val m = Manifest.read(segDir).getOrElse(
      throw new IllegalStateException(s"no committed segment at $segDir"))
    val shift = m.bucketShift
    val docs = spark.read.parquet(s"$segDir/docs").select($"docId", $"url")

    val rows = features
      .select($"url", $"feature".cast("string"), $"value".cast("float"))
      .join(docs, "url")
      .select($"feature", $"docId", $"value")
      .as[(String, Long, Float)]
      .map { case (f, docId, v) =>
        (featureTerm(f), docId >>> shift, docId, encodeValue(v).toLong)
      }
      .toDF("term", "bucket", "docId", "freq")

    val blocks = rows
      .repartition(math.max(1, (m.blockCount / 1024).toInt).min(64), $"term", $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"docId")
      .as[(String, Long, Long, Long)]
      .mapPartitions(featureBlocks)

    blocks.cache()
    val stats = IndexBuilder.buildTermStats(blocks)
    // appended files keep the (term, bucket, firstDocId) sort within each
    // file, so Parquet row-group min/max pruning covers them like the
    // original range layout
    blocks.write.mode(SaveMode.Append).parquet(s"$segDir/postings")
    stats.write.mode(SaveMode.Append).parquet(s"$segDir/terms")
    // keep the reversed dictionary in sync with the appended terms
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$segDir/rterms")))
      stats.select(reverse($"term").as("rterm"), $"term")
        .write.mode(SaveMode.Append).parquet(s"$segDir/rterms")
    val nTerms = stats.count()
    val nBlocks = blocks.count()
    blocks.unpersist()
    val updated = m.copy(termCount = m.termCount + nTerms,
      blockCount = m.blockCount + nBlocks)
    Manifest.commit(segDir, updated)
    markerPath.foreach(p => java.nio.file.Files.createFile(p): Unit)
    updated
  }

  /** 128-doc feature posting blocks over rows sorted by (term, bucket,
    * docId); norm byte = 1 everywhere (features omit norms).
    */
  private def featureBlocks(
      rows: Iterator[(String, Long, Long, Long)]): Iterator[PostingBlock] = {
    val B = BlockCodec.BlockSize
    new Iterator[PostingBlock] {
      private var pending: (String, Long, Long, Long) =
        if (rows.hasNext) rows.next() else null

      def hasNext: Boolean = pending != null

      def next(): PostingBlock = {
        val (term, bucket, _, _) = pending
        val ids = new Array[Long](B)
        val fs = new Array[Long](B)
        var n = 0
        while (pending != null && pending._1 == term && pending._2 == bucket && n < B) {
          ids(n) = pending._3
          fs(n) = pending._4
          n += 1
          pending = if (rows.hasNext) rows.next() else null
        }
        val docIds = java.util.Arrays.copyOf(ids, n)
        val freqs = java.util.Arrays.copyOf(fs, n)
        val norms = Array.fill(n)(1)
        var maxFreq = 0L
        var freqSum = 0L
        var i = 0
        while (i < n) {
          freqSum += freqs(i)
          if (freqs(i) > maxFreq) maxFreq = freqs(i)
          i += 1
        }
        PostingBlock(
          term = term,
          bucket = bucket,
          firstDocId = docIds(0),
          lastDocId = docIds(n - 1),
          numDocs = n,
          docsPacked = BlockCodec.forEncode(BlockCodec.deltaEncode(docIds, docIds(0))),
          freqsPacked = BlockCodec.pforEncode(freqs),
          normsPacked = BlockCodec.forEncode(norms.map(_.toLong)),
          impacts = Impacts.encode(Impacts.skylineInts(freqs, norms, n)),
          freqSum = freqSum,
          maxFreq = maxFreq.toInt,
          minNorm = 1,
          posPacked = null
        )
      }
    }
  }
}
