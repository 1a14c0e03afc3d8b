package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.search.{BoolQuery, BoostQuery, Occur, Query, SynonymQuery, TermQuery}

/** Streaming surfaces of the engine (SURVEY.md §2.4):
  *
  *  - **Percolation** (the reference's monitor module,
  *    `/root/reference/lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java`):
  *    a *document stream* matched against a *stored query set* — expressed as
  *    Structured Streaming with the query set broadcast into a codegen'd
  *    boolean-match predicate per query.
  *  - **Windowed event aggregation** with event-time + watermark: the
  *    standard Structured Streaming shape for NRT metrics over the segment
  *    stream.
  *
  * Both run with `Trigger.AvailableNow` for batch-equivalent, resumable
  * execution (micro-batch appends == the reference's NRT segment publishing).
  */
object Streaming {

  /** Compile a stored query to a codegen'd boolean Column over a token-array
    * column (broadcast-free: the query tree folds into the plan).
    */
  def matchExpr(q: Query, toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    q match {
      case TermQuery(t) => array_contains(toks, t)
      case BoostQuery(q2, _) => matchExpr(q2, toks) // boost is score-only
      case sq: SynonymQuery =>
        sq.synonyms.map(t => array_contains(toks, t)).reduce(_ || _)
      case bq: BoolQuery =>
        val must = bq.must.map(matchExpr(_, toks)) ++ bq.filter.map(matchExpr(_, toks))
        val should = bq.should.map(matchExpr(_, toks))
        val not = bq.mustNot.map(matchExpr(_, toks))
        val mustOk = must.reduceOption(_ && _).getOrElse(lit(true))
        val shouldOk =
          if (bq.should.isEmpty) lit(true)
          else if (bq.minimumShouldMatch > 1)
            should.map(c => when(c, 1).otherwise(0)).reduce(_ + _) >=
              bq.minimumShouldMatch
          else should.reduce(_ || _)
        val notOk = not.map(!_).reduceOption(_ && _).getOrElse(lit(true))
        mustOk && shouldOk && notOk
    }

  /** Percolate a (static or streaming) document frame against stored
    * queries: emits (query_id, doc id) for every match. One narrow pass per
    * doc batch — the query set is folded into a single generated predicate
    * stage, no shuffle.
    */
  def percolate(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Query)]
  ): DataFrame = {
    val toks = split(col(textCol), " ")
    val matchStructs = queries.map { case (qid, q) =>
      when(matchExpr(q, toks), lit(qid)).otherwise(lit(null))
    }
    docs.select(col(idCol).as("doc"),
        array_compact(array(matchStructs: _*)).as("qids"))
      .select(explode(col("qids")).as("query_id"), col("doc"))
  }

  /** Stream the documents of a parquet directory through the percolator and
    * collect all matches (AvailableNow → terminates when caught up).
    */
  /** Spark's streaming file source wants a directory; single-file inputs get
    * a symlinked temp dir.
    */
  private def asStreamDir(path: String): String = {
    val f = new java.io.File(path)
    if (f.isDirectory) path
    else {
      val d = java.nio.file.Files.createTempDirectory("graft-stream")
      java.nio.file.Files.createSymbolicLink(
        d.resolve(f.getName), f.toPath.toAbsolutePath)
      d.toString
    }
  }

  def percolateParquetStream(
      spark: SparkSession, parquetDir0: String, idCol: String, textCol: String,
      queries: Seq[(String, Query)], checkpointDir: String
  ): DataFrame = {
    val parquetDir = asStreamDir(parquetDir0)
    val schema = spark.read.parquet(parquetDir).schema
    val stream = spark.readStream.schema(schema).parquet(parquetDir)
    val matched = percolate(stream, idCol, textCol, queries)
    val sink = s"percolate_${System.nanoTime()}"
    val q = matched.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** Streaming NRT index ingest — the re-expression of the reference's
    * near-real-time flow (`index/DirectoryReader.openIfChanged`,
    * `search/SearcherManager`): a document stream lands as one committed
    * segment per micro-batch (immediately searchable via
    * `IndexSearcher.open`), with the tiered merge policy applied after each
    * batch. Exactly-once across restarts: the stream checkpoint replays
    * unfinished batches and `buildSegment`'s manifest commit makes the
    * replay a no-op for already-committed segments.
    *
    * @return number of committed batches this invocation processed
    */
  def indexStream(
      spark: SparkSession,
      srcParquetDir0: String,
      indexDir: String,
      cfg: graft.index.IndexConfig,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8
  ): Int = {
    import graft.index.{IndexBuilder, LiveSet, SegmentMerger, TieredMergePolicy}
    val srcDir = asStreamDir(srcParquetDir0)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    // crash leftovers (segments outside the live set) from an interrupted
    // merge swap — safe to drop before the checkpoint replay starts: a
    // replayed batch rebuilds its segment deterministically
    LiveSet.gcOrphans(indexDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        import org.apache.spark.sql.functions.col
        import spark.implicits._
        val pages = batch.select(col("url"), col("text")).as[(String, String)]
        val segName = f"seg$id%09d"
        val m = IndexBuilder.buildSegment(pages, s"$indexDir/$segName", cfg)
        LiveSet.add(indexDir, Seq(segName)) // idempotent on replay
        batches.incrementAndGet()
        // merge-scheduler pass (driver-side, after each commit): the live
        // set — not the directory listing — feeds the policy, and each
        // merge swaps the live set atomically BEFORE deleting its inputs
        // (the reference's segments_N protocol; any crash leaves either
        // the old or the new set fully intact)
        var plan = TieredMergePolicy.findMerges(LiveSet.manifests(indexDir))
        var round = 0
        while (plan.nonEmpty) {
          val outName = f"merge_${id}%09d_$round%02d"
          SegmentMerger.merge(spark, plan.head, s"$indexDir/$outName", cfg)
          val inputNames = plan.head.map(d => new java.io.File(d).getName)
          LiveSet.swap(indexDir, inputNames, Seq(outName))
          plan.head.foreach { d =>
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) f.listFiles().foreach(rm)
              f.delete(): Unit
            }
            rm(new java.io.File(d))
          }
          round += 1
          plan = TieredMergePolicy.findMerges(LiveSet.manifests(indexDir))
        }
        val _ = m
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** Event-time tumbling-window aggregation with a watermark over a parquet
    * stream: (window_start, event_type) -> count, sum(value).
    */
  def windowedEventCounts(
      spark: SparkSession, parquetDir0: String, windowLen: String,
      watermark: String, checkpointDir: String
  ): DataFrame = {
    val parquetDir = asStreamDir(parquetDir0)
    val schema = spark.read.parquet(parquetDir).schema
    val stream = spark.readStream.schema(schema).parquet(parquetDir)
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ parquet → event time
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
    val sink = s"winagg_${System.nanoTime()}"
    val q = agg.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }
}
