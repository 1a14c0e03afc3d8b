package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization of embedding vectors — the reference's int7 scheme
  * (`lucene/core/src/java/org/apache/lucene/util/quantization/ScalarQuantizer.java:39-61`,
  * `codecs/lucene99/Lucene99ScalarQuantizedVectorsFormat.java`) re-expressed
  * over a DataFrame column:
  *
  *   byte  = round((x − lo) · 127/(hi − lo))        (:50)
  *   x̂     = lo + byte · α,  α = (hi − lo)/127      (:51)
  *
  * The reference derives [lo, hi] from a confidence interval over sampled
  * vectors; here the fit is the exact global component [min, max] — one
  * metadata-sized aggregate — so the whole pipeline (fit → encode → score)
  * is a deterministic pure function of the input and a DuckDB SQL oracle can
  * replicate it bit-for-bit.
  *
  * 100 TB shape: `encode` stores 1 byte per component (array<tinyint>,
  * offset −128 so 0..127 fits the signed range) — a 4× scan/storage
  * reduction over float32 — and queries score the dequantized form inside
  * whole-stage codegen. Two-stage search ([[topKRescored]]) takes top-C by
  * quantized similarity, then exact-rescoring only C candidates — the
  * standard quantized-ANN recipe (ref
  * `Lucene99ScalarQuantizedVectorScorer.java`: quantized scoring + ordinal
  * rescoring).
  */
object Quantize {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact global component bounds (lo, hi) — the quantization fit. One
    * tiny aggregate; the collect is a single row (driver-metadata-sized).
    */
  def fit(df: DataFrame, vecCol: String): (Double, Double) = {
    val r = df.agg(
      min(array_min(asDouble(col(vecCol)))), max(array_max(asDouble(col(vecCol))))).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    require(hi > lo, s"degenerate component range [$lo, $hi]")
    (lo, hi)
  }

  /** Quantized code array (0..127 stored as tinyint−128): the persisted
    * form — 1 byte/component in Parquet instead of 4.
    */
  def encode(vec: Column, lo: Double, hi: Double): Column = {
    val scale = 127.0 / (hi - lo)
    transform(asDouble(vec),
      x => (round((x - lit(lo)) * lit(scale), 0).cast("int") - 128).cast("tinyint"))
  }

  /** Dequantized reconstruction x̂ = lo + code·α of an [[encode]]d array. */
  def dequantize(qvec: Column, lo: Double, hi: Double): Column = {
    val alpha = (hi - lo) / 127.0
    transform(qvec, b => lit(lo) + (b.cast("double") + 128.0) * lit(alpha))
  }

  /** Top-k neighbors of `queryId`'s vector by quantized cosine: fit → encode
    * → dequantize → cosine, a narrow scan + `TakeOrderedAndProject`. The
    * ranking is the pure function a SQL oracle replicates (no rescore).
    */
  def topK(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int
  ): DataFrame = {
    val (lo, hi) = fit(df, vecCol)
    val v = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        dequantize(encode(col(vecCol), lo, hi), lo, hi).as("v"))
    val q = v.where(col("id") === queryId).select(col("v").as("q"))
    v.where(col("id") =!= queryId).crossJoin(broadcast(q))
      .select(col("id").as(idCol),
        round(Similarity.cosine(col("v"), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc).limit(k)
  }

  /** Two-stage quantized search: top-`c` candidates by quantized cosine,
    * exact float rescore of only those `c`, final top-k — cost = one
    * 1-byte-wide scan + `c` exact dot products. With `c` comfortably above
    * k the result equals the exact top-k (the oracle asserts equality).
    */
  def topKRescored(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, c: Int
  ): DataFrame = {
    require(c >= k, s"rescore pool c=$c < k=$k")
    val cands = topK(df, idCol, vecCol, queryId, c).select(col(idCol))
    val exactQ = df.where(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("q"))
    df.join(cands, idCol)
      .crossJoin(broadcast(exactQ))
      .select(col(idCol),
        round(Similarity.cosine(asDouble(col(vecCol)), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc).limit(k)
  }

  /** One-row (found, total, recall): exact top-k ids recovered by the pure
    * quantized ranking ([[topK]], no rescore) — the official
    * approximation-quality row; `recallFloor` asserted in-entry.
    */
  def recall(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int,
      recallFloor: Double = 0.0
  ): DataFrame = {
    import df.sparkSession.implicits._
    val approx = topK(df, idCol, vecCol, queryId, k).select(col(idCol))
    val qv = df.where(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).as[Array[Double]].head().map(_.toFloat)
    val exact = Similarity.bruteForceTopK(
      df, idCol, vecCol, qv, k, excludeId = Some(queryId)).select(col(idCol))
    val found = exact.join(approx, Seq(idCol), "left_semi").count()
    val total = exact.count()
    val recall =
      if (total == 0) 1.0
      else BigDecimal(found.toDouble / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    require(recall >= recallFloor,
      s"recall $recall ($found/$total) below documented floor $recallFloor")
    Seq((found, total, recall)).toDF("found", "total", "recall")
  }

  // ------------------- binary quantization (1 bit per component) --------

  /** Component-wise center for binary quantization — the centering step of
    * the reference's 1-bit format
    * (`codecs/lucene102/Lucene102BinaryQuantizedVectorsFormat.java:38-41`:
    * vectors are centered before single-bit quantization). The reference
    * centers on the corpus MEAN; here the center is the exact component
    * MIDRANGE (min+max)/2 — the same exact-extremes fit discipline as the
    * int7 band's global [min,max], chosen because min/max are
    * order-independent selections while a float mean depends on
    * accumulation order and would leave the engine/oracle bit one ulp
    * apart on straddling components (documented divergence). One explode +
    * one dim-sized aggregate; the result is driver-metadata-sized.
    */
  def bqCentroid(df: DataFrame, vecCol: String): Array[Double] = {
    val rows = df
      .select(posexplode(asDouble(col(vecCol)))).toDF("i", "x")
      .groupBy(col("i")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("i")).collect()
    rows.map(r => (r.getDouble(1) + r.getDouble(2)) / 2.0)
  }

  /** 64-bit sign code of a centered vector: bit i set iff component i >=
    * centroid(i) — 32× smaller than float32. A pure codegen'd expression
    * (64 comparisons OR-folded into one long), no UDF.
    */
  def bqCode(vec: Column, cent: Array[Double]): Column = {
    require(cent.length <= 64, s"bqCode packs <= 64 dims, got ${cent.length}")
    cent.indices.map { i =>
      when(vec.getItem(i).cast("double") >= lit(cent(i)), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Top-k by Hamming distance between sign codes (ascending; ties by id) —
    * the pure 1-bit ranking, a 8-byte-wide scan + popcount(xor) +
    * `TakeOrderedAndProject`. Deterministic pure function of the input, so
    * the SQL oracle replicates it from the raw floats (per-component
    * sign-disagreement count — no bit packing needed on the oracle side).
    *
    * Divergence from the reference (documented): Lucene102 additionally
    * quantizes QUERY vectors to 4 bits with corrective factors
    * (`Lucene102BinaryQuantizedVectorsFormat.java:42-46`); here the coarse
    * stage is symmetric 1-bit and accuracy is recovered by exact rescoring
    * ([[bqTopKRescored]]) — recall measured by the official recall row.
    */
  def bqTopK(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int
  ): DataFrame = {
    val cent = bqCentroid(df, vecCol)
    val coded = df.select(col(idCol).as(idCol),
      bqCode(col(vecCol), cent).as("code"))
    val qcode = coded.where(col(idCol) === queryId).select(col("code"))
      .head().getLong(0)
    coded.where(col(idCol) =!= queryId)
      .select(col(idCol),
        bit_count(col("code").bitwiseXOR(lit(qcode))).cast("int").as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }

  /** Asymmetric 1-bit estimator: the centered QUERY at full precision
    * dotted with a document's sign vector, Σ_j qc_j·(2·bit_j − 1) — the
    * reference's asymmetric-comparison idea
    * (`Lucene102BinaryQuantizedVectorsFormat.java:42-46`, query at higher
    * precision than the 1-bit docs), here with the query kept exact. A
    * fixed-order 64-term codegen'd fold over the packed code — measured
    * far better candidate recall than symmetric Hamming on near-random
    * vectors (0.9–1.0 vs 0.5–0.8 at pool 200).
    */
  def bqScore(code: Column, qCentered: Array[Double]): Column =
    qCentered.indices.map { j =>
      when(shiftright(code, j).bitwiseAND(lit(1L)) === 1L, lit(qCentered(j)))
        .otherwise(lit(-qCentered(j)))
    }.reduce(_ + _)

  /** Two-stage binary-quantized search: top-`c` candidates by the
    * asymmetric 1-bit estimator ([[bqScore]]), exact float rescore of only
    * those `c`, final top-k — one 8-byte-wide scan + `c` exact dot
    * products (the BQ analogue of [[topKRescored]]).
    */
  def bqTopKRescored(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, c: Int
  ): DataFrame = {
    import df.sparkSession.implicits._
    require(c >= k, s"rescore pool c=$c < k=$k")
    val cent = bqCentroid(df, vecCol)
    val qv = df.where(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).as[Array[Double]].head()
    val qc = qv.zip(cent).map { case (x, m) => x - m }
    val cands = df
      .select(col(idCol), bqCode(col(vecCol), cent).as("code"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), round(bqScore(col("code"), qc), 4).as("est"))
      .orderBy(col("est").desc, col(idCol).asc).limit(c)
      .select(col(idCol))
    val exactQ = df.where(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("q"))
    df.join(cands, idCol)
      .crossJoin(broadcast(exactQ))
      .select(col(idCol),
        round(Similarity.cosine(asDouble(col(vecCol)), col("q")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc).limit(k)
  }

  /** One-row (found, total, recall): exact top-k recovered by the RESCORED
    * binary ranking ([[bqTopKRescored]] with pool `c`) — the official
    * quality row for the 1-bit path; `recallFloor` asserted in-entry.
    */
  def bqRecall(
      df: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int,
      c: Int, recallFloor: Double = 0.0
  ): DataFrame = {
    import df.sparkSession.implicits._
    val approx = bqTopKRescored(df, idCol, vecCol, queryId, k, c).select(col(idCol))
    val qv = df.where(col(idCol) === queryId)
      .select(asDouble(col(vecCol))).as[Array[Double]].head().map(_.toFloat)
    val exact = Similarity.bruteForceTopK(
      df, idCol, vecCol, qv, k, excludeId = Some(queryId)).select(col(idCol))
    val found = exact.join(approx, Seq(idCol), "left_semi").count()
    val total = exact.count()
    val recall =
      if (total == 0) 1.0
      else BigDecimal(found.toDouble / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    require(recall >= recallFloor,
      s"bq recall $recall ($found/$total) below documented floor $recallFloor")
    Seq((found, total, recall)).toDF("found", "total", "recall")
  }
}
