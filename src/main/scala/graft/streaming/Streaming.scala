package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.search.{BoolQuery, Occur, Query, TermQuery}

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
      case bq: BoolQuery =>
        val must = bq.must.map(matchExpr(_, toks)) ++ bq.filter.map(matchExpr(_, toks))
        val should = bq.should.map(matchExpr(_, toks))
        val not = bq.mustNot.map(matchExpr(_, toks))
        val mustOk = must.reduceOption(_ && _).getOrElse(lit(true))
        val shouldOk =
          if (bq.should.isEmpty) lit(true) else should.reduce(_ || _)
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
