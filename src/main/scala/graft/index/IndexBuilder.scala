package graft.index

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.analysis.StandardAnalyzer
import graft.codec.{BlockCodec, Impacts, SmallFloat}
import graft.index.Schema._

/** Index-build configuration.
  *
  * @param bucketShift  docID-space salt granularity: bucket = docId >>> shift.
  *                     At 10^12 docs the default (2^20-doc buckets) yields
  *                     ~10^6 scoring partitions; local tests use smaller
  *                     shifts. Head-term skew is bounded by bucket span.
  * @param numPostingPartitions  range partitions for (term, bucket) — the
  *                     term-dictionary layout.
  * @param stopwords    analyzer stopword set (reference default: empty).
  */
final case class IndexConfig(
    bucketShift: Int = 20,
    numPostingPartitions: Int = 32,
    numDocPartitions: Int = 32,
    stopwords: Set[String] = Set.empty,
    maxTokenLength: Int = 255
) {
  def analyzer: StandardAnalyzer = new StandardAnalyzer(stopwords, maxTokenLength)
}

/** Builds an inverted-index segment from a corpus of (docKey, text) rows.
  *
  * Pipeline (one tokenize pass, one shuffle to posting order):
  * {{{
  * input --sort by url--> docId assignment (global url rank)
  *       --mapPartitions (analyze once)--> DocTokens (terms/freqs arrays)
  *       --posexplode (narrow)--> (term, docId, freq, norm)
  *       --repartitionByRange(term, bucket) + sortWithinPartitions--> 128-doc
  *         PostingBlocks (delta + FOR/PFor packed, competitive impacts)
  *       --partial-agg groupBy(term) over blocks--> TermStats
  * }}}
  *
  * This is the Spark re-expression of the reference indexing chain
  * (`index/IndexingChain.java:553-616` invert → `FreqProxTermsWriter.java:83-135`
  * flush → `Lucene103PostingsWriter.java:256-530` block encode): the shuffle
  * plays the role of the in-RAM `BytesRefHash` + flush sort, and partition
  * parallelism replaces the DWPT thread pool.
  */
object IndexBuilder {

  private val SortCacheName = "graft-docid-sort"

  private def dropSortCache(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .filter(_.name == SortCacheName).foreach(_.unpersist(blocking = false))

  /** Assign dense deterministic docIDs: global rank of `url` in sorted order.
    * Two narrow passes after one range shuffle (`zipWithIndex` computes
    * per-partition offsets with a lightweight count job) — the only safe,
    * re-runnable assignment at 10^12 docs (`monotonically_increasing_id` is
    * partitioning-dependent; a global window would single-partition).
    */
  def assignDocIds(
      pages: Dataset[(String, String)], // (url, text)
      cfg: IndexConfig
  ): Dataset[(Long, String, String)] = { // (docId, url, text)
    val spark = pages.sparkSession
    import spark.implicits._
    val parts = cfg.numDocPartitions
    val sorted = pages
      .toDF("_1", "_2").as[(String, String)] // normalize column names
      .repartitionByRange(parts, $"_1")
      .sortWithinPartitions($"_1")
      .rdd
    // zipWithIndex runs a per-partition count job then the real pass; cache
    // the sorted run so the shuffle+sort isn't paid twice
    sorted.setName(SortCacheName)
    sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sorted
      .zipWithIndex()
      .map { case ((url, text), id) => (id, url, text) }
      .toDS()
  }

  /** Tokenize each doc exactly once into term-frequency arrays + norm. */
  def tokenizeDocs(
      docs: Dataset[(Long, String, String)],
      cfg: IndexConfig
  ): Dataset[DocTokens] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stop = cfg.stopwords
    val maxLen = cfg.maxTokenLength
    docs.mapPartitions { it =>
      val analyzer = new StandardAnalyzer(stop, maxLen)
      it.map { case (docId, url, text) =>
        val (freqMap, length) = analyzer.termFreqs(text)
        val n = freqMap.size
        val terms = new Array[String](n)
        val freqs = new Array[Int](n)
        var i = 0
        val iter = freqMap.entrySet().iterator()
        while (iter.hasNext) {
          val e = iter.next()
          terms(i) = e.getKey
          freqs(i) = e.getValue
          i += 1
        }
        DocTokens(docId, url, length,
          java.lang.Byte.toUnsignedInt(SmallFloat.intToByte4(length)), terms, freqs)
      }
    }
  }

  /** Build posting blocks: the single wide shuffle of the index build. */
  def buildPostings(
      docTokens: Dataset[DocTokens],
      cfg: IndexConfig
  ): Dataset[PostingBlock] = {
    val spark = docTokens.sparkSession
    import spark.implicits._
    val shift = cfg.bucketShift
    // narrow explode: (term, bucket, docId, freq, norm)
    val tokens = docTokens
      .select($"docId", $"norm", explode(arrays_zip($"terms", $"freqs")).as("tf"))
      .select(
        $"tf.terms".as("term"),
        shiftright($"docId", shift).as("bucket"),
        $"docId",
        $"tf.freqs".as("freq"),
        $"norm"
      )
    tokens
      .repartitionByRange(cfg.numPostingPartitions, $"term", $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"docId")
      .as[(String, Long, Long, Int, Int)]
      .mapPartitions(blockBuilder(_))
  }

  /** Streaming 128-doc block builder over (term, bucket, docId, freq, norm)
    * rows sorted by (term, bucket, docId). O(blockSize) state.
    */
  private def blockBuilder(
      rows: Iterator[(String, Long, Long, Int, Int)]
  ): Iterator[PostingBlock] = new Iterator[PostingBlock] {
    private val B = BlockCodec.BlockSize
    private val docIds = new Array[Long](B)
    private val freqs = new Array[Long](B)
    private val norms = new Array[Int](B)
    private var n = 0
    private var curTerm: String = null
    private var curBucket = 0L
    private var pendingRow: (String, Long, Long, Int, Int) = null
    private var nextBlock: PostingBlock = null

    private def flushBlock(): PostingBlock = {
      val ids = java.util.Arrays.copyOf(docIds, n)
      val fs = java.util.Arrays.copyOf(freqs, n)
      val first = ids(0)
      val deltas = BlockCodec.deltaEncode(ids, first)
      val pairs = new Array[(Int, Int)](n)
      val normsL = new Array[Long](n)
      var i = 0
      var freqSum = 0L
      var maxFreq = 0
      var minNorm = Int.MaxValue
      while (i < n) {
        pairs(i) = (fs(i).toInt, norms(i))
        normsL(i) = norms(i).toLong
        freqSum += fs(i)
        if (fs(i) > maxFreq) maxFreq = fs(i).toInt
        if (norms(i) < minNorm) minNorm = norms(i)
        i += 1
      }
      val block = PostingBlock(
        term = curTerm,
        bucket = curBucket,
        firstDocId = first,
        lastDocId = ids(n - 1),
        numDocs = n,
        docsPacked = BlockCodec.forEncode(deltas),
        freqsPacked = BlockCodec.pforEncode(fs),
        normsPacked = BlockCodec.forEncode(normsL),
        impacts = Impacts.encode(Impacts.skyline(pairs)),
        freqSum = freqSum,
        maxFreq = maxFreq,
        minNorm = minNorm
      )
      n = 0
      block
    }

    private def advance(): Unit = {
      while (nextBlock == null && (pendingRow != null || rows.hasNext)) {
        val row = if (pendingRow != null) { val r = pendingRow; pendingRow = null; r }
                  else rows.next()
        val (term, bucket, docId, freq, norm) = row
        if (curTerm == null) { curTerm = term; curBucket = bucket }
        if (term != curTerm || bucket != curBucket || n == B) {
          pendingRow = row
          if (n > 0) nextBlock = flushBlock()
          curTerm = term
          curBucket = bucket
        } else {
          docIds(n) = docId; freqs(n) = freq.toLong; norms(n) = norm; n += 1
        }
      }
      if (nextBlock == null && n > 0) nextBlock = flushBlock()
    }

    override def hasNext: Boolean = { if (nextBlock == null) advance(); nextBlock != null }
    override def next(): PostingBlock = {
      if (!hasNext) throw new NoSuchElementException
      val b = nextBlock; nextBlock = null; b
    }
  }

  /** Term dictionary from block metadata (128× smaller than raw tokens;
    * partial aggregation makes the head-term agg skew-safe).
    */
  def buildTermStats(blocks: Dataset[PostingBlock]): Dataset[TermStat] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks
      .groupBy($"term")
      .agg(sum($"numDocs").as("docFreq"), sum($"freqSum").as("totalTermFreq"))
      .as[TermStat]
  }

  /** End-to-end: build and atomically commit one segment at `dir`. Resumable:
    * if the segment manifest already exists the build is skipped (the
    * re-expression of the reference's two-phase `segments_N` commit,
    * `index/SegmentInfos.java`).
    */
  def buildSegment(
      pages: Dataset[(String, String)],
      dir: String,
      cfg: IndexConfig = IndexConfig()
  ): SegmentManifest = {
    Manifest.read(dir) match {
      case Some(m) => m // resume: segment already committed
      case None =>
        val spark = pages.sparkSession
        import spark.implicits._
        val t0 = System.nanoTime()
        val docs = assignDocIds(pages, cfg)
        val docTokens = tokenizeDocs(docs, cfg)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val docsOut = docTokens
            .select($"docId", $"url", $"length", $"norm").as[DocEntry]
          docsOut.write.mode(SaveMode.Overwrite).parquet(s"$dir/docs")
          dropSortCache(spark) // docTokens is materialized; sorted run done

          val blocks = buildPostings(docTokens, cfg)
            .persist(StorageLevel.MEMORY_AND_DISK)
          // postings are already range-partitioned + sorted by (term, bucket)
          // → Parquet row-group min/max on `term` gives dictionary pruning
          blocks.write.mode(SaveMode.Overwrite).parquet(s"$dir/postings")

          buildTermStats(blocks)
            .repartitionByRange(math.max(1, cfg.numPostingPartitions / 4), $"term")
            .sortWithinPartitions($"term")
            .write.mode(SaveMode.Overwrite).parquet(s"$dir/terms")

          // ONE pass over the cached docTokens yields the per-partition
          // lineage + metrics (north rule: resumable builds with lineage)
          // AND the collection stats (docCount, sumTotalTermFreq, maxDocId)
          val lineage = docTokens
            .groupBy(spark_partition_id().as("partition"))
            .agg(count(lit(1)).as("rows"), sum($"length").as("tokens"),
              max($"docId").as("maxId"))
            .as[(Int, Long, Long, Long)]
            .collect()
            .sortBy(_._1)
          val docCount = lineage.map(_._2).sum
          val sumTtf = lineage.map(_._3).sum
          val maxDocId = if (lineage.isEmpty) -1L else lineage.map(_._4).max
          val blockCount = blocks.count()
          val termCount = spark.read.parquet(s"$dir/terms").count()
          blocks.unpersist()
          val manifest = SegmentManifest(
            segmentId = java.util.UUID.nameUUIDFromBytes(dir.getBytes).toString,
            dir = dir,
            docCount = docCount,
            maxDocId = maxDocId,
            sumTotalTermFreq = sumTtf,
            termCount = termCount,
            blockCount = blockCount,
            bucketShift = cfg.bucketShift,
            buildWallSec = (System.nanoTime() - t0) / 1e9,
            lineage = lineage.map { case (p, r, t, _) => PartitionLineage(p, r, t) }.toSeq
          )
          Manifest.commit(dir, manifest)
          manifest
        } finally docTokens.unpersist()
    }
  }
}
